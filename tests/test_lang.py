"""Frontend DSL tests (analog of test/lang/test_srt_backend.py):
gen/select/fork/roles against an embedded Engine backend."""

import pytest

import iaas_sglang_tpu.lang as sgl


@pytest.fixture(scope="module")
def backend(tmp_path_factory):
    from transformers import AutoTokenizer

    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs
    from tests.server_utils import SERVER_TINY_LLAMA, make_tiny_model_dir

    d = make_tiny_model_dir(str(tmp_path_factory.mktemp("m") / "tok"))
    tok = AutoTokenizer.from_pretrained(d)
    sa = ServerArgs(
        model_path="test://lang", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, device="cpu",
        max_running_requests=8, max_prefill_tokens=256,
        chunked_prefill_size=128, random_seed=0, skip_tokenizer_init=True,
    )
    eng = Engine(sa, hf_config_override=SERVER_TINY_LLAMA, tokenizer=tok)
    return sgl.EngineBackend(eng)


def test_gen_and_vars(backend):
    @sgl.function
    def prog(s, topic):
        s += "Write about " + topic + ": "
        s += sgl.gen("body", max_tokens=8, temperature=0.0, ignore_eos=True)

    state = prog.run(topic="cats", backend=backend)
    assert len(state["body"]) > 0
    assert state.text.startswith("Write about cats: ")
    assert state.text.endswith(state["body"])


def test_roles(backend):
    @sgl.function
    def chat(s, q):
        s += sgl.system("Be brief.")
        s += sgl.user(q)
        s += sgl.assistant(sgl.gen("answer", max_tokens=6, temperature=0.0,
                                   ignore_eos=True))

    state = chat.run(q="hello?", backend=backend)
    assert "system: Be brief." in state.text
    assert "user: hello?" in state.text
    assert state["answer"]


def test_select(backend):
    @sgl.function
    def judge(s):
        s += "Is the sky blue? "
        s += sgl.select("verdict", choices=["yes", "no"])

    state = judge.run(backend=backend)
    assert state["verdict"] in ("yes", "no")


def test_fork(backend):
    @sgl.function
    def forked(s):
        s += "Common prefix. "
        branches = s.fork(2)
        outs = []
        for i, b in enumerate(branches):
            b += f"branch {i}: "
            b += sgl.gen("g", max_tokens=4, temperature=0.0, ignore_eos=True)
            outs.append(b["g"])
        s.vars["branches"] = outs

    state = forked.run(backend=backend)
    assert len(state.vars["branches"]) == 2


def test_run_batch(backend):
    @sgl.function
    def prog(s, x):
        s += x + " -> "
        s += sgl.gen("y", max_tokens=3, temperature=0.0, ignore_eos=True)

    states = prog.run_batch([{"x": "a"}, {"x": "b"}, {"x": "c"}],
                            backend=backend, max_workers=1)
    assert len(states) == 3
    for st in states:
        assert st["y"]


def test_trace_program_and_prefix():
    from iaas_sglang_tpu import lang as sgl

    @sgl.function
    def qa(s, question):
        s += sgl.system("You are terse.")
        s += sgl.user(question)
        s += "assistant: "
        s += sgl.gen("answer", max_tokens=8)
        s += "\nfollow-up: "
        s += sgl.gen("more", max_tokens=4)

    trace = sgl.trace_program(qa, "why?")
    assert trace.gen_names() == ["answer", "more"]
    kinds = [k for k, _ in trace.ops]
    assert kinds == ["text", "gen", "text", "gen"]
    prefix = sgl.extract_prefix_by_tracing(qa, "why?")
    assert prefix.startswith("system: You are terse.")
    assert prefix.endswith("assistant: ")
    # the prefix is exactly the text before the first generation
    assert trace.ops[0][1] == prefix


def test_choices_methods_unit():
    from iaas_sglang_tpu.lang import choices as ch

    # token_length_normalized: mean logprob decides, not sum
    d = ch.token_length_normalized(
        ["a", "bb"], [[-1.0], [-0.6, -0.6]])
    assert d.decision == "bb"
    assert d.meta_info["normalized_prompt_logprobs"] == [-1.0, -0.6]

    # greedy: longest argmax-prefix run wins even with worse mean
    d = ch.greedy_token_selection(
        ["a", "b"], [[-2.0], [-1.0]], top_logprob_matches=[1, 0])
    assert d.decision == "a"
    # degrades to normalized without argmax info
    d = ch.greedy_token_selection(["a", "b"], [[-2.0], [-1.0]])
    assert d.decision == "b"

    # unconditional: corrects for a-priori likely strings
    d = ch.unconditional_likelihood_normalized(
        ["a", "b"], [[-1.0], [-1.5]],
        unconditional_logprobs=[[-1.0], [-3.0]])
    assert d.decision == "b"  # (−1−−1)=0 < (−1.5−−3)=1.5


@pytest.mark.parametrize("method", [
    "token_length_normalized", "greedy_token_selection",
    "unconditional_likelihood_normalized"])
def test_select_choices_methods_live(backend, method):
    @sgl.function
    def judge(s):
        s += "Is the sky blue? "
        s += sgl.select("verdict", choices=["yes", "no"],
                        choices_method=method)

    state = judge.run(backend=backend)
    assert state["verdict"] in ("yes", "no")
    meta = state.vars["verdict__meta"]
    key = next(iter(meta))
    assert len(meta[key]) == 2
