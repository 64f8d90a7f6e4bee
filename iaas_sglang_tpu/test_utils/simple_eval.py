"""Accuracy evals: GSM8K few-shot + MMLU
(analog of sglang python/sglang/test/simple_eval_gsm8k.py /
few_shot_gsm8k.py / simple_eval_mmlu.py, re-hosted to read LOCAL dataset
files — this environment has no network egress).

    python -m iaas_sglang_tpu.test_utils.simple_eval gsm8k \
        --data /path/to/gsm8k_test.jsonl --base-url http://...:30000 \
        --num-questions 200 --num-shots 8

Dataset formats:
    gsm8k: jsonl rows {"question": ..., "answer": "...#### 42"}
    mmlu:  csv rows   question,A,B,C,D,answer
"""

from __future__ import annotations

import argparse
import csv
import json
import re
from typing import List, Optional

import requests

INVALID = -9999


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
        resp = requests.post(f"{base_url}/generate", json={
            "text": prompt,
            "sampling_params": {"max_new_tokens": max_tokens,
                                "temperature": 0.0,
                                "stop": ["Question:", "\n\n"]},
        }, timeout=600).json()
        if _gsm8k_answer(resp["text"]) == _gold_gsm8k(r["answer"]):
            correct += 1
    return correct / max(len(questions), 1)


def run_mmlu(data_path: str, base_url: str, num_questions: int) -> float:
    with open(data_path) as f:
        rows = list(csv.reader(f))[:num_questions]
    correct = 0
    for row in rows:
        q, a, b, c, d, gold = row[:6]
        prompt = (f"{q.strip()}\nA. {a}\nB. {b}\nC. {c}\nD. {d}\n"
                  "Answer with a single letter.\nAnswer:")
        resp = requests.post(f"{base_url}/generate", json={
            "text": prompt,
            "sampling_params": {"max_new_tokens": 4, "temperature": 0.0,
                                "regex": r" ?[ABCD]"},
        }, timeout=600).json()
        if resp["text"].strip().startswith(gold.strip()):
            correct += 1
    return correct / max(len(rows), 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("task", choices=["gsm8k", "mmlu"])
    ap.add_argument("--data", required=True)
    ap.add_argument("--base-url", default="http://127.0.0.1:30000")
    ap.add_argument("--num-questions", type=int, default=200)
    ap.add_argument("--num-shots", type=int, default=8)
    args = ap.parse_args()
    if args.task == "gsm8k":
        acc = run_gsm8k(args.data, args.base_url, args.num_questions,
                        args.num_shots)
    else:
        acc = run_mmlu(args.data, args.base_url, args.num_questions)
    print(json.dumps({"task": args.task, "accuracy": round(acc, 4),
                      "num_questions": args.num_questions}))


if __name__ == "__main__":
    main()
