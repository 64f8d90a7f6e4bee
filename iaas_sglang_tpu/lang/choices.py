"""Select choice-scoring methods (analog of sglang lang/choices.py:
token_length_normalized / greedy_token_selection /
unconditional_likelihood_normalized).

A scoring method turns per-choice token logprobs (conditional on the
program prefix, and optionally unconditional) into a decision. Backends
that can score sequences (`score_choices`) feed these; backends that
can't fall back to the interpreter's constrained-generation select.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class ChoicesDecision:
    decision: str
    meta_info: Dict = field(default_factory=dict)


class ChoicesSamplingMethod:
    """Base: __call__(choices, logprobs, unconditional_logprobs)."""

    requires_unconditional_logprobs = False

    def __call__(self, choices: List[str],
                 logprobs: List[List[float]],
                 unconditional_logprobs: Optional[List[List[float]]] = None,
                 top_logprob_matches: Optional[List[int]] = None,
                 ) -> ChoicesDecision:
        raise NotImplementedError


def _mean(xs: List[float]) -> float:
    return sum(xs) / max(len(xs), 1)


class TokenLengthNormalized(ChoicesSamplingMethod):
    """Pick the choice with the highest mean token logprob (the
    reference's default; robust to choices of different token counts)."""

    def __call__(self, choices, logprobs, unconditional_logprobs=None,
                 top_logprob_matches=None) -> ChoicesDecision:
        scores = [_mean(lp) for lp in logprobs]
        best = max(range(len(choices)), key=lambda i: scores[i])
        return ChoicesDecision(
            decision=choices[best],
            meta_info={"normalized_prompt_logprobs": scores})


class GreedyTokenSelection(ChoicesSamplingMethod):
    """Pick the choice whose tokens are greedily preferred for the
    longest unbroken prefix, tie-broken by normalized logprob (reference
    greedy_token_selection walks the top-logprob path). Requires
    `top_logprob_matches`: for each choice, the count of leading tokens
    that are the model's argmax at their position."""

    def __call__(self, choices, logprobs, unconditional_logprobs=None,
                 top_logprob_matches=None) -> ChoicesDecision:
        if top_logprob_matches is None:
            # degrade to normalized scoring when the backend can't report
            # per-position argmax information
            return TokenLengthNormalized()(choices, logprobs)
        norm = [_mean(lp) for lp in logprobs]
        best = max(range(len(choices)),
                   key=lambda i: (top_logprob_matches[i], norm[i]))
        return ChoicesDecision(
            decision=choices[best],
            meta_info={"greedy_matches": list(top_logprob_matches),
                       "normalized_prompt_logprobs": norm})


class UnconditionalLikelihoodNormalized(ChoicesSamplingMethod):
    """Mean of (conditional - unconditional) token logprobs: corrects for
    choices that are a-priori likely strings (reference
    unconditional_likelihood_normalized)."""

    requires_unconditional_logprobs = True

    def __call__(self, choices, logprobs, unconditional_logprobs=None,
                 top_logprob_matches=None) -> ChoicesDecision:
        assert unconditional_logprobs is not None, \
            "unconditional_likelihood_normalized needs unconditional scores"
        scores = []
        for cond, uncond in zip(logprobs, unconditional_logprobs):
            scores.append(_mean(cond) - _mean(uncond))
        best = max(range(len(choices)), key=lambda i: scores[i])
        return ChoicesDecision(
            decision=choices[best],
            meta_info={"unconditional_normalized_logprobs": scores})


token_length_normalized = TokenLengthNormalized()
greedy_token_selection = GreedyTokenSelection()
unconditional_likelihood_normalized = UnconditionalLikelihoodNormalized()

CHOICES_SAMPLING_METHODS = {
    "token_length_normalized": token_length_normalized,
    "greedy_token_selection": greedy_token_selection,
    "unconditional_likelihood_normalized": unconditional_likelihood_normalized,
}
