"""Weight lifecycle: update_weights_from_tensor / get_weights_by_name /
release+resume memory occupation (the RL-colocation surface —
engine.py + scheduler.py:2344-2382 analogs)."""

import numpy as np

from tests.test_scheduler import make_engine


def test_update_weights_from_tensor_changes_output():
    eng = make_engine()
    ids = list(range(10, 24))
    sp = {"max_new_tokens": 6, "temperature": 0.0}
    before = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]

    # perturb the LM head; outputs must change
    w = eng.get_weights_by_name("lm_head")
    rng = np.random.default_rng(7)
    noisy = w + rng.standard_normal(w.shape).astype(w.dtype) * 0.5
    ok, msg = eng.update_weights_from_tensor({"lm_head": noisy})
    assert ok, msg
    eng.flush_cache()
    after = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    assert before != after

    # restore and verify round-trip determinism
    ok, _ = eng.update_weights_from_tensor({"lm_head": w})
    assert ok
    eng.flush_cache()
    restored = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    assert restored == before


def test_get_weights_by_name_shape():
    eng = make_engine()
    w = eng.get_weights_by_name("embed")
    assert w.shape == (eng.model_config.vocab_size,
                       eng.model_config.hidden_size)


def test_release_resume_memory():
    eng = make_engine()
    ids = list(range(5, 15))
    sp = {"max_new_tokens": 4, "temperature": 0.0}
    before = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    eng.release_memory_occupation()
    assert eng.scheduler.model_runner.params is None
    eng.resume_memory_occupation()
    after = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    # dummy load with the same seed reproduces the same weights
    assert after == before
