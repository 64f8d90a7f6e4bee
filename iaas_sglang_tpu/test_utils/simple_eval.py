"""Accuracy evals: GSM8K, MMLU, MGSM, MATH, HumanEval, GPQA
(analog of sglang python/sglang/test/simple_eval_{gsm8k,mmlu,mgsm,math,
humaneval,gpqa}.py + few_shot_gsm8k.py, re-hosted to read LOCAL dataset
files — this environment has no network egress; the reference downloads
from openaipublic blob URLs).

    python -m iaas_sglang_tpu.test_utils.simple_eval gsm8k \
        --data /path/to/gsm8k_test.jsonl --base-url http://...:30000 \
        --num-questions 200 --num-shots 8

Dataset formats:
    gsm8k:     jsonl rows {"question": ..., "answer": "...#### 42"}
    mmlu:      csv rows   question,A,B,C,D,answer
    mgsm:      tsv rows   problem<TAB>answer     (per-language file)
    math:      csv rows with Question,Answer columns (reference
               simple_eval_math.py reads the same CSV) or jsonl
               {"problem"/"Question": ..., "answer"/"Answer": ...}
    humaneval: jsonl rows {"task_id","prompt","test","entry_point"}
               (the openai human-eval HumanEval.jsonl layout)
    gpqa:      csv rows with Question,"Correct Answer",
               "Incorrect Answer 1..3" (reference simple_eval_gpqa.py)

Scoring differences vs the reference worth knowing: MATH equality uses a
normalized numeric/string comparison instead of the reference's
LLM-as-equality-checker (no second model in this environment), and
HumanEval executes candidates in a subprocess sandbox (the reference
imports the human-eval package, absent here).
"""

from __future__ import annotations

import argparse
import csv
import json
import math as _math
import random
import re
import subprocess
import sys
import tempfile
from fractions import Fraction
from typing import List, Optional

import requests

INVALID = -9999

# matches the reference's simple_eval_common.ANSWER_PATTERN
ANSWER_PATTERN = r"(?i)Answer\s*:\s*([^\n]+)"


def _generate(base_url: str, prompt: str, sampling_params: dict,
              timeout: int = 600) -> str:
    resp = requests.post(f"{base_url}/generate", json={
        "text": prompt, "sampling_params": sampling_params,
    }, timeout=timeout).json()
    return resp["text"]


# --------------------------------------------------------------- gsm8k

def _gsm8k_answer(text: str) -> int:
    m = re.findall(r"-?[\d,]+(?:\.\d+)?", text.replace(",", ""))
    if not m:
        return INVALID
    try:
        return int(float(m[-1]))
    except ValueError:
        return INVALID


def _gold_gsm8k(answer_field: str) -> int:
    return _gsm8k_answer(answer_field.split("####")[-1])


def run_gsm8k(data_path: str, base_url: str, num_questions: int,
              num_shots: int, max_tokens: int = 256) -> float:
    rows = [json.loads(l) for l in open(data_path)]
    shots, questions = rows[:num_shots], rows[num_shots:num_shots + num_questions]
    few_shot = "".join(
        f"Question: {r['question']}\nAnswer: {r['answer'].split('####')[0].strip()}"
        f" The answer is {_gold_gsm8k(r['answer'])}.\n\n"
        for r in shots
    )
    correct = 0
    for r in questions:
        prompt = few_shot + f"Question: {r['question']}\nAnswer:"
        text = _generate(base_url, prompt, {
            "max_new_tokens": max_tokens, "temperature": 0.0,
            "stop": ["Question:", "\n\n"]})
        if _gsm8k_answer(text) == _gold_gsm8k(r["answer"]):
            correct += 1
    return correct / max(len(questions), 1)


# ---------------------------------------------------------------- mmlu

def run_mmlu(data_path: str, base_url: str, num_questions: int) -> float:
    with open(data_path) as f:
        rows = list(csv.reader(f))[:num_questions]
    correct = 0
    for row in rows:
        q, a, b, c, d, gold = row[:6]
        prompt = (f"{q.strip()}\nA. {a}\nB. {b}\nC. {c}\nD. {d}\n"
                  "Answer with a single letter.\nAnswer:")
        text = _generate(base_url, prompt, {
            "max_new_tokens": 4, "temperature": 0.0, "regex": r" ?[ABCD]"})
        if text.strip().startswith(gold.strip()):
            correct += 1
    return correct / max(len(rows), 1)


# ---------------------------------------------------------------- mgsm
# Per-language answer prefixes from the reference simple_eval_mgsm.py
# LANG_TO_ANSWER_PREFIX; the instruction template is kept English for all
# languages (answer extraction is what decides correctness).

MGSM_ANSWER_PREFIX = {
    "en": "Answer", "bn": "উত্তর", "de": "Antwort", "es": "Respuesta",
    "fr": "Réponse", "ja": "答え", "ru": "Ответ", "sw": "Jibu",
    "te": "సమాధానం", "th": "คำตอบ", "zh": "答案",
}

MGSM_INSTRUCTION = (
    'Solve this math problem. Give the reasoning steps before giving the '
    'final answer on the last line by itself in the format of '
    '"{prefix}:". Do not add anything other than the integer answer '
    'after "{prefix}:".\n\n{input}'
)


def _mgsm_extract(text: str, lang: str) -> str:
    """Reference parse: take the text after the last answer-prefix line,
    strip non-digits, compare as a plain string."""
    prefix = MGSM_ANSWER_PREFIX[lang]
    if prefix not in text:
        return ""
    tail = text.split(prefix)[-1].lstrip(": ")
    m = re.findall(r"-?\d[\d,\. ]*", tail)
    if not m:
        return ""
    return m[0].rstrip(".").replace(",", "").replace(". ", "").replace(" ", "")


def run_mgsm(data_path: str, base_url: str, num_questions: int,
             lang: str = "en", max_tokens: int = 512) -> float:
    rows = []
    with open(data_path) as f:
        for line in f:
            if not line.strip():
                continue
            problem, _, answer = line.rstrip("\n").partition("\t")
            rows.append((problem, answer))
    rows = rows[:num_questions]
    prefix = MGSM_ANSWER_PREFIX[lang]
    correct = 0
    for problem, answer in rows:
        prompt = MGSM_INSTRUCTION.format(prefix=prefix, input=problem)
        text = _generate(base_url, prompt, {
            "max_new_tokens": max_tokens, "temperature": 0.0})
        gold = answer.replace(",", "").strip()
        if _mgsm_extract(text, lang) == gold:
            correct += 1
    return correct / max(len(rows), 1)


# ---------------------------------------------------------------- math

MATH_QUERY_TEMPLATE = (
    "Solve the following math problem step by step. The last line of your "
    "response should be of the form Answer: $ANSWER (without quotes) where "
    "$ANSWER is the answer to the problem.\n\n{Question}\n\nRemember to put "
    'your answer on its own line after "Answer:", and you do not need to '
    "use a \\boxed command."
)


def _math_normalize(ans: str) -> str:
    ans = ans.strip()
    m = re.search(r"\\boxed\{(.+)\}", ans)
    if m:
        ans = m.group(1)
    ans = ans.replace("$", "").replace("\\!", "").replace("\\,", "")
    ans = ans.replace("\\left", "").replace("\\right", "")
    ans = ans.replace("dfrac", "frac").replace("tfrac", "frac")
    ans = ans.replace(" ", "").rstrip(".").lstrip("+")
    # \frac{a}{b} -> a/b
    ans = re.sub(r"\\frac\{([^{}]+)\}\{([^{}]+)\}", r"\1/\2", ans)
    ans = re.sub(r"\\frac(\d)(\d)", r"\1/\2", ans)
    ans = ans.replace("{", "").replace("}", "")
    return ans


def math_check_equality(gold: str, pred: Optional[str]) -> bool:
    """Normalized string/numeric equality (stands in for the reference's
    LLM equality checker)."""
    if pred is None:
        return False
    g, p = _math_normalize(gold), _math_normalize(pred)
    if g == p:
        return True

    def _num(s: str):
        try:
            return Fraction(s)
        except (ValueError, ZeroDivisionError):
            pass
        try:
            return Fraction(float(s.replace(",", ""))).limit_denominator(10**9)
        except (ValueError, OverflowError):
            return None

    ng, np_ = _num(g), _num(p)
    if ng is not None and np_ is not None:
        return ng == np_
    return False


def _iter_math_rows(data_path: str):
    if data_path.endswith(".jsonl"):
        for line in open(data_path):
            if line.strip():
                r = json.loads(line)
                yield (r.get("Question") or r["problem"],
                       str(r.get("Answer") or r["answer"]))
    else:
        with open(data_path) as f:
            reader = csv.DictReader(f)
            for r in reader:
                yield r["Question"], str(r["Answer"])


def run_math(data_path: str, base_url: str, num_questions: int,
             max_tokens: int = 1024) -> float:
    rows = list(_iter_math_rows(data_path))[:num_questions]
    correct = 0
    for question, gold in rows:
        text = _generate(base_url, MATH_QUERY_TEMPLATE.format(Question=question),
                         {"max_new_tokens": max_tokens, "temperature": 0.0})
        m = re.search(ANSWER_PATTERN, text)
        if math_check_equality(gold, m.group(1) if m else None):
            correct += 1
    return correct / max(len(rows), 1)


# ------------------------------------------------------------ humaneval

_HUMANEVAL_SANDBOX = """
import json, sys
payload = json.load(open(sys.argv[1]))
program = (payload["prompt"] + payload["completion"] + "\\n" +
           payload["test"] + "\\n" +
           f"check({payload['entry_point']})\\n")
exec_globals = {}
exec(program, exec_globals)
print("HUMANEVAL_PASS")
"""


def humaneval_check_correctness(sample: dict, completion: str,
                                timeout: float = 10.0) -> bool:
    """Run prompt+completion+test+check(entry_point) in a subprocess
    (the reference delegates to human_eval.execution.check_correctness,
    which does the same with extra os-level guards)."""
    with tempfile.NamedTemporaryFile("w", suffix=".json") as pf, \
            tempfile.NamedTemporaryFile("w", suffix=".py") as sf:
        json.dump({"prompt": sample["prompt"], "completion": completion,
                   "test": sample["test"],
                   "entry_point": sample["entry_point"]}, pf)
        pf.flush()
        sf.write(_HUMANEVAL_SANDBOX)
        sf.flush()
        try:
            out = subprocess.run(
                [sys.executable, sf.name, pf.name],
                capture_output=True, timeout=timeout, text=True)
        except subprocess.TimeoutExpired:
            return False
        return out.returncode == 0 and "HUMANEVAL_PASS" in out.stdout


def estimate_pass_at_k(num_samples: int, num_correct: int, k: int) -> float:
    """Unbiased pass@k estimator (Chen et al. 2021, eq. used by
    human_eval.evaluation.estimate_pass_at_k)."""
    n, c = num_samples, num_correct
    if n - c < k:
        return 1.0
    return 1.0 - _math.prod(1.0 - k / i for i in range(n - c + 1, n + 1))


def _strip_code_block(text: str) -> str:
    """Completion post-processing (reference findcode/_clean): prefer a
    fenced code block body; cut at obvious next-definition markers."""
    m = re.search(r"```(?:python)?\n(.*?)```", text, re.DOTALL)
    if m:
        text = m.group(1)
    for marker in ("\ndef ", "\nclass ", "\nif __name__", "\nprint("):
        idx = text.find(marker)
        if idx >= 0:
            text = text[:idx]
    return text


def run_humaneval(data_path: str, base_url: str, num_questions: int,
                  num_samples_per_task: int = 1, k: int = 1,
                  max_tokens: int = 512) -> float:
    rows = [json.loads(l) for l in open(data_path) if l.strip()]
    rows = rows[:num_questions]
    scores = []
    for sample in rows:
        n_correct = 0
        for i in range(num_samples_per_task):
            text = _generate(base_url, sample["prompt"], {
                "max_new_tokens": max_tokens,
                "temperature": 0.0 if num_samples_per_task == 1 else 0.8,
                "stop": ["\ndef ", "\nclass ", "\nif __name__", "\nprint("],
            })
            if humaneval_check_correctness(sample, _strip_code_block(text)):
                n_correct += 1
        scores.append(estimate_pass_at_k(num_samples_per_task, n_correct, k))
    return sum(scores) / max(len(scores), 1)


# ---------------------------------------------------------------- gpqa

GPQA_QUERY_TEMPLATE = (
    "Answer the following multiple choice question. The last line of your "
    "response should be of the following format: 'Answer: $LETTER' "
    "(without quotes) where LETTER is one of ABCD. Think step by step "
    "before answering.\n\n{Question}\n\nA) {A}\nB) {B}\nC) {C}\nD) {D}"
)
GPQA_ANSWER_PATTERN = r"(?i)Answer\s*:\s*\$?([ABCD])\b"


def run_gpqa(data_path: str, base_url: str, num_questions: int,
             max_tokens: int = 1024, seed: int = 0) -> float:
    with open(data_path) as f:
        rows = list(csv.DictReader(f))[:num_questions]
    rng = random.Random(seed)
    correct = 0
    for row in rows:
        # reference shuffles the 4 options per-question with a seeded rng
        options = [row["Correct Answer"], row["Incorrect Answer 1"],
                   row["Incorrect Answer 2"], row["Incorrect Answer 3"]]
        perm = list(range(4))
        rng.shuffle(perm)
        letters = "ABCD"
        shuffled = [options[i] for i in perm]
        gold_letter = letters[perm.index(0)]
        prompt = GPQA_QUERY_TEMPLATE.format(
            Question=row["Question"], A=shuffled[0], B=shuffled[1],
            C=shuffled[2], D=shuffled[3])
        text = _generate(base_url, prompt, {
            "max_new_tokens": max_tokens, "temperature": 0.0})
        m = re.search(GPQA_ANSWER_PATTERN, text)
        if m and m.group(1).upper() == gold_letter:
            correct += 1
    return correct / max(len(rows), 1)


# ----------------------------------------------------------------- cli

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("task", choices=["gsm8k", "mmlu", "mgsm", "math",
                                     "humaneval", "gpqa"])
    ap.add_argument("--data", required=True)
    ap.add_argument("--base-url", default="http://127.0.0.1:30000")
    ap.add_argument("--num-questions", type=int, default=200)
    ap.add_argument("--num-shots", type=int, default=8)
    ap.add_argument("--lang", default="en", choices=sorted(MGSM_ANSWER_PREFIX))
    ap.add_argument("--num-samples-per-task", type=int, default=1)
    ap.add_argument("--k", type=int, default=1)
    args = ap.parse_args()
    if args.task == "gsm8k":
        acc = run_gsm8k(args.data, args.base_url, args.num_questions,
                        args.num_shots)
    elif args.task == "mmlu":
        acc = run_mmlu(args.data, args.base_url, args.num_questions)
    elif args.task == "mgsm":
        acc = run_mgsm(args.data, args.base_url, args.num_questions,
                       lang=args.lang)
    elif args.task == "math":
        acc = run_math(args.data, args.base_url, args.num_questions)
    elif args.task == "humaneval":
        acc = run_humaneval(args.data, args.base_url, args.num_questions,
                            args.num_samples_per_task, args.k)
    else:
        acc = run_gpqa(args.data, args.base_url, args.num_questions)
    print(json.dumps({"task": args.task, "accuracy": round(acc, 4),
                      "num_questions": args.num_questions}))


if __name__ == "__main__":
    main()
