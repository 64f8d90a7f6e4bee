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


def test_update_weights_from_distributed():
    """Trainer->server weight sync over the ZMQ update group (the
    reference's NCCL group analog, model_runner.py:745,790)."""
    import json

    import zmq

    eng = make_engine()
    ids = list(range(10, 24))
    sp = {"max_new_tokens": 6, "temperature": 0.0}
    before = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]

    ctx = zmq.Context.instance()
    push = ctx.socket(zmq.PUSH)
    port = push.bind_to_random_port("tcp://127.0.0.1")
    ok, msg = eng.init_weights_update_group("127.0.0.1", port)
    assert ok, msg

    w = eng.get_weights_by_name("lm_head")
    rng = np.random.default_rng(3)
    noisy = (w + rng.standard_normal(w.shape).astype(w.dtype) * 0.5)
    push.send_multipart([
        b"lm_head", str(noisy.dtype).encode(),
        json.dumps(list(noisy.shape)).encode(),
        np.ascontiguousarray(noisy).tobytes(),
    ])
    ok, msg = eng.update_weights_from_distributed(["lm_head"])
    assert ok, msg
    eng.flush_cache()
    after = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    assert after != before
    push.close(0)


def test_save_and_reload_sharded_model(tmp_path):
    """save_sharded_model -> --load-format sharded_state round trip
    reproduces outputs token-for-token (scheduler.py:2213 analog)."""
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs
    from tests.utils import TINY_LLAMA as TINY

    eng = make_engine()
    ids = list(range(3, 17))
    sp = {"max_new_tokens": 6, "temperature": 0.0}
    before = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    ok, msg = eng.save_sharded_model(str(tmp_path), max_shard_bytes=1 << 20)
    assert ok, msg

    eng2 = Engine(ServerArgs(
        model_path=str(tmp_path), load_format="sharded_state",
        dtype="float32", page_size=4, max_total_tokens=2048,
        skip_tokenizer_init=True, random_seed=0), hf_config_override=TINY)
    after = eng2.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    assert after == before


def test_save_remote_model_file_connector(tmp_path):
    """save_remote_model through the file:// connector; the connector's
    weight_iterator reads the tensors back."""
    from iaas_sglang_tpu.connector import create_remote_connector

    eng = make_engine()
    url = f"file://{tmp_path}/store"
    ok, msg = eng.save_remote_model(url)
    assert ok, msg
    conn = create_remote_connector(url)
    names = {k: v for k, v in conn.weight_iterator()}
    w = eng.get_weights_by_name("embed")
    np.testing.assert_array_equal(names["embed"], w)
