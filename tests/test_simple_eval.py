"""Eval harness scoring logic (test_utils/simple_eval.py) — pure scoring
functions plus run_* loops driven by a stubbed /generate endpoint
(analog of the reference's simple_eval_* answer-extraction behavior)."""

import csv
import json

import pytest

from iaas_sglang_tpu.test_utils import simple_eval as se


# ------------------------------------------------------------- extraction

def test_gsm8k_answer_extraction():
    assert se._gsm8k_answer("... so the total is 1,234.") == 1234
    assert se._gsm8k_answer("The answer is 72") == 72
    assert se._gsm8k_answer("no numbers here") == se.INVALID
    assert se._gold_gsm8k("blah blah\n#### 42") == 42


def test_mgsm_extraction():
    assert se._mgsm_extract("reasoning...\nAnswer: 1,250", "en") == "1250"
    assert se._mgsm_extract("...\nAntwort: 17.", "de") == "17"
    assert se._mgsm_extract("no prefix at all", "en") == ""
    assert se._mgsm_extract("答案: 3 000", "zh") == "3000"


def test_math_equality():
    assert se.math_check_equality("42", "42")
    assert se.math_check_equality("1/2", "0.5")
    assert se.math_check_equality("\\frac{3}{4}", "0.75")
    assert se.math_check_equality("$10$", "10")
    assert se.math_check_equality("\\boxed{7}", "7")
    assert not se.math_check_equality("42", "41")
    assert not se.math_check_equality("42", None)
    assert se.math_check_equality("x+1", "x + 1")  # string-normalized


def test_pass_at_k_estimator():
    assert se.estimate_pass_at_k(1, 1, 1) == 1.0
    assert se.estimate_pass_at_k(1, 0, 1) == 0.0
    # n=5, c=2, k=1 -> c/n
    assert abs(se.estimate_pass_at_k(5, 2, 1) - 0.4) < 1e-12
    # n - c < k -> 1.0
    assert se.estimate_pass_at_k(5, 4, 2) == 1.0


def test_humaneval_sandbox_pass_and_fail():
    sample = {
        "prompt": "def add(a, b):\n",
        "test": "def check(f):\n    assert f(1, 2) == 3\n",
        "entry_point": "add",
    }
    assert se.humaneval_check_correctness(sample, "    return a + b\n")
    assert not se.humaneval_check_correctness(sample, "    return a - b\n")
    # infinite loop must time out, not hang
    assert not se.humaneval_check_correctness(
        sample, "    while True: pass\n", timeout=3.0)


def test_strip_code_block():
    fenced = "```python\n    return a + b\n```\nextra prose"
    assert se._strip_code_block(fenced).strip() == "return a + b"
    raw = "    return a + b\ndef next_fn():\n    pass"
    assert "next_fn" not in se._strip_code_block(raw)


# ------------------------------------------------------------- run loops

class _FakeResp:
    def __init__(self, text):
        self._text = text

    def json(self):
        return {"text": self._text}


@pytest.fixture
def fake_generate(monkeypatch):
    """Route simple_eval's requests.post to a canned prompt->text map
    (function of the prompt)."""
    calls = {}

    def install(fn):
        def post(url, json=None, timeout=None):
            calls.setdefault("prompts", []).append(json["text"])
            return _FakeResp(fn(json["text"]))
        monkeypatch.setattr(se.requests, "post", post)
        return calls

    return install


def test_run_gsm8k_loop(tmp_path, fake_generate):
    rows = [{"question": f"q{i}", "answer": f"work\n#### {i}"}
            for i in range(4)]
    p = tmp_path / "gsm8k.jsonl"
    p.write_text("".join(json.dumps(r) + "\n" for r in rows))
    # 2 shots, 2 questions; answer correctly only for q2
    fake_generate(lambda prompt: " the answer is 2" if "q2" in
                  prompt.rsplit("Question:", 1)[-1] else " it is 999")
    acc = se.run_gsm8k(str(p), "http://x", num_questions=2, num_shots=2)
    assert acc == 0.5


def test_run_mmlu_loop(tmp_path, fake_generate):
    p = tmp_path / "mmlu.csv"
    with open(p, "w") as f:
        w = csv.writer(f)
        w.writerow(["q1", "o1", "o2", "o3", "o4", "B"])
        w.writerow(["q2", "o1", "o2", "o3", "o4", "C"])
    fake_generate(lambda prompt: " B")
    assert se.run_mmlu(str(p), "http://x", num_questions=2) == 0.5


def test_run_mgsm_loop(tmp_path, fake_generate):
    p = tmp_path / "mgsm_en.tsv"
    p.write_text("problem one\t11\nproblem two\t22\n")
    fake_generate(lambda prompt: "steps...\nAnswer: 11")
    assert se.run_mgsm(str(p), "http://x", num_questions=2) == 0.5


def test_run_math_loop(tmp_path, fake_generate):
    p = tmp_path / "math.csv"
    with open(p, "w") as f:
        w = csv.DictWriter(f, fieldnames=["Question", "Answer"])
        w.writeheader()
        w.writerow({"Question": "1+1?", "Answer": "2"})
        w.writerow({"Question": "half?", "Answer": "1/2"})
    fake_generate(lambda prompt: "steps\nAnswer: 0.5")
    assert se.run_math(str(p), "http://x", num_questions=2) == 0.5


def test_run_humaneval_loop(tmp_path, fake_generate):
    rows = [
        {"task_id": "T/0", "prompt": "def f(x):\n",
         "test": "def check(f):\n    assert f(2) == 4\n",
         "entry_point": "f"},
        {"task_id": "T/1", "prompt": "def g(x):\n",
         "test": "def check(g):\n    assert g(2) == 0\n",
         "entry_point": "g"},
    ]
    p = tmp_path / "he.jsonl"
    p.write_text("".join(json.dumps(r) + "\n" for r in rows))
    fake_generate(lambda prompt: "    return x * 2\n")
    assert se.run_humaneval(str(p), "http://x", num_questions=2) == 0.5


def test_run_gpqa_loop(tmp_path, fake_generate):
    p = tmp_path / "gpqa.csv"
    with open(p, "w") as f:
        w = csv.DictWriter(f, fieldnames=[
            "Question", "Correct Answer", "Incorrect Answer 1",
            "Incorrect Answer 2", "Incorrect Answer 3"])
        w.writeheader()
        w.writerow({"Question": "pick right", "Correct Answer": "RIGHT",
                    "Incorrect Answer 1": "w1", "Incorrect Answer 2": "w2",
                    "Incorrect Answer 3": "w3"})
    seen = {}

    def answer(prompt):
        # find which letter RIGHT landed on and answer it
        for line in prompt.splitlines():
            if line.endswith(") RIGHT"):
                seen["letter"] = line[0]
                return f"thinking...\nAnswer: {line[0]}"
        return "Answer: A"

    fake_generate(answer)
    assert se.run_gpqa(str(p), "http://x", num_questions=1) == 1.0
    assert seen["letter"] in "ABCD"
