"""Checkpoint/resume, phase timers, and checkify wrapper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import nn
from tpu_flash.utils import (
    PhaseTimer,
    checked,
    list_checkpoints,
    restore_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = nn.DecoderConfig(n_vocab=50, n_embd=32, n_head=4, n_positions=16,
                           n_layer=1, attention_kind="naive")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    opt = nn.adam(lr=1e-3)
    opt_state = opt.init(params)
    # advance one step so the state is non-trivial
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    params2, opt_state2 = opt.update(g, opt_state, params)

    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 7, {"params": params2, "opt": opt_state2},
                    metadata={"lr": 1e-3})
    tree, step, meta = restore_checkpoint(d)
    assert step == 7 and meta["lr"] == 1e-3
    for (n1, a), (n2, b) in zip(nn.named_parameters(tree["params"]),
                                nn.named_parameters(params2)):
        assert n1 == n2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state attribute access survives
    assert int(tree["opt"].step) == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(tree["opt"].exp_avg)[0]),
        np.asarray(jax.tree_util.tree_leaves(opt_state2.exp_avg)[0]))
    # training continues from the restored state
    params3, _ = opt.update(g, tree["opt"], tree["params"])
    params3_ref, _ = opt.update(g, opt_state2, params2)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(params3)[0]),
        np.asarray(jax.tree_util.tree_leaves(params3_ref)[0]), rtol=1e-6)


def test_checkpoint_prune_and_latest(tmp_path):
    d = str(tmp_path / "ckpt")
    for s in [1, 5, 3, 9, 11]:
        save_checkpoint(d, s, {"x": jnp.asarray([float(s)])}, keep=3)
    assert list_checkpoints(d) == [5, 9, 11]
    tree, step, _ = restore_checkpoint(d)
    assert step == 11 and float(tree["x"][0]) == 11.0
    tree5, step5, _ = restore_checkpoint(d, step=5)
    assert step5 == 5 and float(tree5["x"][0]) == 5.0


def test_phase_timer():
    t = PhaseTimer()
    x = jnp.ones((128, 128))
    for _ in range(3):
        with t.phase("mm", out=x):
            x = x @ x * 1e-3
    s = t.summary()
    assert "mm" in s and s["mm"] > 0
    assert t.counts["mm"] == 3
    assert "mm" in t.report()


def test_checked_catches_nan():
    def bad(x):
        return jnp.log(x)  # nan for negative input

    f = checked(bad)
    f(jnp.asarray([1.0, 2.0]))  # fine
    with pytest.raises(Exception):
        f(jnp.asarray([-1.0]))


def test_metrics_logger(tmp_path):
    import jax.numpy as jnp

    from tpu_flash.utils.metrics import MetricsLogger, read_metrics

    path = tmp_path / "m.jsonl"
    with MetricsLogger(path, run={"cfg": {"n": 1}}) as m:
        m.log(loss=jnp.float32(2.5), tokens_per_sec=100)
        m.log(step=7, loss=1.25)
    recs = read_metrics(path)
    assert recs[0]["event"] == "run_start" and recs[0]["cfg"] == {"n": 1}
    assert recs[1]["step"] == 1 and recs[1]["loss"] == 2.5
    assert isinstance(recs[1]["loss"], float)
    assert recs[2]["step"] == 7 and recs[2]["loss"] == 1.25
    assert all("wall" in r for r in recs[1:])


def test_metrics_logger_nan_safe(tmp_path):
    import json

    from tpu_flash.utils.metrics import MetricsLogger, read_metrics

    path = tmp_path / "m.jsonl"
    with MetricsLogger(path) as m:
        m.log(loss=float("nan"), lr=float("inf"), ok=1.5)
    recs = read_metrics(path)  # must be strict-JSON loadable
    assert recs[0]["loss"] is None and recs[0]["lr"] is None
    assert recs[0]["ok"] == 1.5
    json.loads(open(path).read().splitlines()[0])  # strict parse


def test_async_checkpointer(tmp_path):
    from tpu_flash.utils import AsyncCheckpointer

    d = str(tmp_path / "ckpt")
    with AsyncCheckpointer(keep=2) as ckpt:
        for s in range(4):
            tree = {"x": jnp.asarray([float(s)]),
                    "opt": nn.adam(1e-3).init({"w": jnp.ones((2,))})}
            ckpt.save(d, s, tree, metadata={"s": s})
        ckpt.wait()
        assert list_checkpoints(d) == [2, 3]     # ordered writes + pruning
    tree, step, meta = restore_checkpoint(d)
    assert step == 3 and meta["s"] == 3
    assert float(tree["x"][0]) == 3.0
    assert int(tree["opt"].step) == 0            # namedtuple rebuilt

    # the snapshot happens at save() time: mutating (rebinding) the arrays
    # afterwards must not change what lands on disk — the donation-safety
    # contract the MT train loop relies on
    with AsyncCheckpointer() as ckpt:
        x = jnp.asarray([1.0, 2.0])
        ckpt.save(d, 10, {"x": x})
        x = x * 100.0
    tree, step, _ = restore_checkpoint(d)
    np.testing.assert_array_equal(np.asarray(tree["x"]), [1.0, 2.0])


def test_async_checkpointer_surfaces_write_errors(tmp_path):
    from tpu_flash.utils import AsyncCheckpointer

    ckpt = AsyncCheckpointer()
    # a FILE where the checkpoint dir should be -> background write fails
    bad = tmp_path / "not_a_dir"
    bad.write_text("occupied")
    ckpt.save(str(bad), 0, {"x": jnp.asarray([1.0])})
    with pytest.raises(Exception):
        ckpt.close()


def test_roofline_accounting():
    from tpu_flash.utils.roofline import (Ceiling, attention_bytes,
                                          decode_attention_bytes, roofline,
                                          weight_matmul_bytes)

    c = Ceiling("test", tflops=100.0, gbs=1000.0)
    # pure compute bound: 1e12 FLOPs at 100 TFLOP/s -> 10 ms ideal
    p = roofline(20.0, 1e12, 1e6, ceiling=c)
    assert p.bound == "compute"
    np.testing.assert_allclose(p.ideal_ms, 10.0)
    np.testing.assert_allclose(p.fraction, 0.5)
    np.testing.assert_allclose(p.achieved_tflops, 50.0)
    # pure memory bound: 1e9 bytes at 1000 GB/s -> 1 ms ideal
    p = roofline(2.0, 1e6, 1e9, ceiling=c)
    assert p.bound == "memory"
    np.testing.assert_allclose(p.ideal_ms, 1.0)
    np.testing.assert_allclose(p.fraction, 0.5)
    s = p.summary()
    assert s["bound"] == "memory" and s["ceiling"] == "test"

    # traffic models: simple closed forms
    np.testing.assert_allclose(attention_bytes(1, 1, 128, 64),
                               4 * 128 * 64 * 2)
    np.testing.assert_allclose(
        attention_bytes(1, 1, 128, 64, fwd_and_bwd=True),
        12 * 128 * 64 * 2)
    np.testing.assert_allclose(
        decode_attention_bytes(2, 8, 1024, 64, cache_bytes=1,
                               scale_heads=8),
        2 * 2 * 1024 * 8 * 64 + 2 * 2 * 8 * 1024 * 4)
    np.testing.assert_allclose(
        weight_matmul_bytes(32, 256, 512, weight_bytes=0.5),
        256 * 512 * 0.5 + (32 * 256 + 32 * 512) * 2)
