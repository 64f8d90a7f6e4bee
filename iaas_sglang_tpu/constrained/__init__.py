from iaas_sglang_tpu.constrained.base_grammar_backend import (
    BaseGrammarBackend,
    BaseGrammarObject,
    create_grammar_backend,
)

__all__ = [
    "BaseGrammarBackend",
    "BaseGrammarObject",
    "create_grammar_backend",
]
