"""Oracle-A breadth: randomized sweep of the fused-attention kwarg lattice
and the functional-op zoo over strides/permutes.

The reference property-tests its full op zoo over random shapes, strides and
permutations with per-op grad checks (tests/test_tensor_general.py:22-25,
tests/tensor_strategies.py:23-127, minitorch/testing.py:10-213).  jnp makes
the raw tensor semantics redundant, but the repo's own fused surface —
``flash_attention`` with every kwarg combination — deserves the same
randomized treatment: this module draws cases from the full lattice

    causal x window x segment_ids x GQA x kv_quant x dropout
    x unaligned L x (Lq != Lk) x dtype

and checks forward AND gradients against a dense jnp oracle built from the
same primitive masks (ops/reference.py), plus an op-zoo sweep of the
functional layer over permuted/strided views with central-difference grad
checks (utils/grad_check.py — the analog of tensor_functions.py:670-709).
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import tpu_flash
from tpu_flash.nn import functional as F
from tpu_flash.ops import reference as ref
from tpu_flash.ops.attention import _quantize_kv
from tpu_flash.utils.grad_check import central_difference


def _dense_oracle(q, k, v, *, causal, window, seg, dropout_rate, seed):
    """Dense attention with the exact kernel-mask semantics (additive -1e7
    masks, bottom-right-aligned causal, hash dropout on the normalized P)."""
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    if kf.shape[1] != qf.shape[1]:          # GQA
        g = qf.shape[1] // kf.shape[1]
        kf = jnp.repeat(kf, g, axis=1)
        vf = jnp.repeat(vf, g, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * ref.default_scale(
        q.shape[-1])
    if causal:
        s = s + ref.causal_mask(q.shape[-2], k.shape[-2], s.dtype)
        if window is not None:
            s = s + ref.window_mask(q.shape[-2], k.shape[-2], window, s.dtype)
    if seg is not None:
        s = ref.apply_segment_mask(s, seg)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        p = p * ref.dropout_keep_oracle(
            q.shape[0], qf.shape[1], q.shape[2], k.shape[2],
            seed, dropout_rate)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vf)


@st.composite
def lattice_case(draw):
    b = draw(st.integers(1, 2))
    hkv = draw(st.integers(1, 2))
    g = draw(st.sampled_from([1, 1, 2, 4]))     # GQA group (bias plain MHA)
    h = hkv * g
    d = draw(st.sampled_from([8, 16, 32, 64]))
    causal = draw(st.booleans())
    lq = draw(st.integers(1, 48))
    lk = draw(st.integers(1, 48))
    if causal and lq > lk:
        lq, lk = lk, lq                         # every row sees >= 1 key
    feature = draw(st.sampled_from(
        ["none", "none", "window", "segments", "dropout", "int8", "fp8"]))
    window = None
    segmented = False
    dropout = 0.0
    kv_quant = "none"
    if feature == "window":
        causal = True
        if lq > lk:
            lq, lk = lk, lq
        window = draw(st.integers(1, max(1, lk)))
    elif feature == "segments":
        lk = lq
        segmented = True
    elif feature == "dropout":
        dropout = draw(st.sampled_from([0.1, 0.35]))
    elif feature in ("int8", "fp8"):
        kv_quant = feature
    dtype = draw(st.sampled_from([jnp.float32, jnp.float32, jnp.bfloat16]))
    seed = draw(st.integers(0, 2**31 - 1))
    return dict(b=b, h=h, hkv=hkv, d=d, lq=lq, lk=lk, causal=causal,
                window=window, segmented=segmented, dropout=dropout,
                kv_quant=kv_quant, dtype=dtype, seed=seed)


@given(lattice_case())
@settings(max_examples=60, deadline=None)
def test_flash_kwarg_lattice_fw_bw(case):
    rng = np.random.default_rng(case["seed"] % 100003)
    dtype = case["dtype"]
    q = jnp.asarray(rng.standard_normal(
        (case["b"], case["h"], case["lq"], case["d"])), dtype)
    k = jnp.asarray(rng.standard_normal(
        (case["b"], case["hkv"], case["lk"], case["d"])), dtype)
    v = jnp.asarray(rng.standard_normal(
        (case["b"], case["hkv"], case["lk"], case["d"])), dtype)
    w = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)
    seg = None
    if case["segmented"]:
        seg = jnp.asarray(
            np.sort(rng.integers(0, 3, (case["b"], case["lq"]))), jnp.int32)

    kwargs = dict(causal=case["causal"], window=case["window"],
                  segment_ids=seg, dropout_rate=case["dropout"],
                  dropout_seed=case["seed"], kv_quant=case["kv_quant"])

    if case["kv_quant"] != "none":
        # The kernel consumes codes; the oracle consumes the dequantized
        # values (straight-through semantics), so build them explicitly.
        kc, ks = _quantize_kv(k, case["kv_quant"])
        vc, vs = _quantize_kv(v, case["kv_quant"])
        k_oracle = (kc.astype(jnp.float32) * ks[..., None]).astype(dtype)
        v_oracle = (vc.astype(jnp.float32) * vs[..., None]).astype(dtype)
    else:
        k_oracle, v_oracle = k, v

    def loss_flash(q, k, v):
        out = tpu_flash.flash_attention(q, k, v, impl="pallas", **kwargs)
        return jnp.sum(out.astype(jnp.float32) * w), out

    def loss_oracle(q, k, v):
        out = _dense_oracle(q, k, v, causal=case["causal"],
                            window=case["window"], seg=seg,
                            dropout_rate=case["dropout"], seed=case["seed"])
        return jnp.sum(out * w), out

    with jax.default_matmul_precision("highest"):
        (_, out), grads = jax.value_and_grad(
            loss_flash, (0, 1, 2), has_aux=True)(q, k, v)
        (_, out_ref), grads_ref = jax.value_and_grad(
            loss_oracle, (0, 1, 2), has_aux=True)(q, k_oracle, v_oracle)

    if dtype == jnp.bfloat16:
        fw_tol, bw_tol = 5e-2, 2.5e-1
    else:
        fw_tol, bw_tol = 2e-3, 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out_ref, np.float32),
        atol=fw_tol, rtol=fw_tol, err_msg=f"forward mismatch: {case}")
    for name, a, b in zip("qkv", grads, grads_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=bw_tol, rtol=bw_tol,
            err_msg=f"d{name} mismatch: {case}")


# --------------------------------------------------------------------------
# Functional-layer op zoo over permuted / strided views (the reference's
# MathTestVariable sweep, minitorch/testing.py:10-213).
# --------------------------------------------------------------------------

_ONE_ARG = {
    "neg": (lambda x: -x, lambda x: -x, (-5, 5)),
    "addConstant": (lambda x: x + 5.0, lambda x: x + 5.0, (-5, 5)),
    "square": (lambda x: x * x, lambda x: x * x, (-5, 5)),
    "cube": (lambda x: x * x * x, lambda x: x * x * x, (-3, 3)),
    "inv": (lambda x: 1.0 / (x + 3.5), lambda x: 1.0 / (x + 3.5), (-1, 1)),
    "sig": (jax.nn.sigmoid,
            lambda x: 1.0 / (1.0 + np.exp(-x)), (-5, 5)),
    "log": (lambda x: jnp.log(x + 1e6 * 0 + 6.0),
            lambda x: np.log(x + 6.0), (-5, 5)),
    "relu": (lambda x: jax.nn.relu(x + 5.5),
             lambda x: np.maximum(x + 5.5, 0), (-5, 5)),
    "exp": (lambda x: jnp.exp(x - 2.0), lambda x: np.exp(x - 2.0), (-3, 3)),
    "tanh": (jnp.tanh, np.tanh, (-5, 5)),
    "gelu": (F.gelu, None, (-3, 3)),
    "softmax": (lambda x: F.softmax(x, axis=-1), None, (-5, 5)),
    "logsumexp": (lambda x: F.logsumexp(x, axis=-1), None, (-5, 5)),
}
_TWO_ARG = {
    "add": (jnp.add, np.add),
    "mul": (jnp.multiply, np.multiply),
    "lt": (lambda a, b: (a < b).astype(jnp.float32),
           lambda a, b: (a < b).astype(np.float32)),
    "eq": (lambda a, b: (a == b).astype(jnp.float32),
           lambda a, b: (a == b).astype(np.float32)),
    "max": (jnp.maximum, np.maximum),
    "div": (lambda a, b: a / (b + 5.5), lambda a, b: a / (b + 5.5)),
}
_REDUCE = {
    "sum": (jnp.sum, np.sum),
    "mean": (jnp.mean, np.mean),
    "max": (jnp.max, np.max),
}


@st.composite
def strided_view(draw, lo=-5.0, hi=5.0):
    """A base array plus a permuted, stepped-slice (non-contiguous) view —
    the analog of tensor_strategies.py's random strides/permutations."""
    shape = tuple(draw(st.lists(st.integers(2, 6), min_size=2, max_size=4)))
    base = np.asarray(
        draw(st.lists(st.floats(lo, hi, width=32, allow_nan=False,
                                allow_subnormal=False),
                      min_size=int(np.prod(shape)),
                      max_size=int(np.prod(shape)))),
        np.float32).reshape(shape)
    perm = tuple(draw(st.permutations(range(len(shape)))))
    steps = tuple(draw(st.sampled_from([1, 1, 2])) for _ in shape)
    view = np.transpose(base, perm)
    view = view[tuple(slice(None, None, s) for s in steps)]
    return view


@given(st.sampled_from(sorted(_ONE_ARG)), strided_view(), st.data())
@settings(max_examples=60, deadline=None)
def test_op_zoo_one_arg(name, x, data):
    jf, nf, (lo, hi) = _ONE_ARG[name]
    x = np.clip(x, lo, hi)
    got = np.asarray(jf(jnp.asarray(x)), np.float32)
    if nf is not None:
        np.testing.assert_allclose(got, nf(x.astype(np.float64)),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"{name} fw")
    # Grad check vs central difference at a random coordinate.  The
    # differenced function is the single output coordinate, NOT the full
    # sum — differencing sum(f) of a large array in fp32 loses the signal
    # to cancellation (rounding of the ~|sum| term dwarfs the 2*eps delta).
    idx = tuple(data.draw(st.integers(0, s - 1)) for s in x.shape)
    # reducing ops (logsumexp) have lower-rank outputs: project the index
    oshape = np.shape(got)
    oidx = tuple(min(i, s - 1) for i, s in zip(idx, oshape))
    fn_idx = lambda t: jf(t)[oidx]
    g = float(jax.grad(fn_idx)(jnp.asarray(x))[idx])
    num = central_difference(fn_idx, jnp.asarray(x), arg=0, idx=idx)
    np.testing.assert_allclose(g, num, rtol=1e-2, atol=1e-2,
                               err_msg=f"{name} grad at {idx}")


@given(st.sampled_from(sorted(_TWO_ARG)), strided_view(), st.data())
@settings(max_examples=60, deadline=None)
def test_op_zoo_two_arg(name, x, data):
    jf, nf = _TWO_ARG[name]
    y = np.asarray(
        data.draw(st.lists(st.floats(-5, 5, width=32, allow_nan=False,
                                     allow_subnormal=False),
                           min_size=x.size, max_size=x.size)),
        np.float32).reshape(x.shape)
    np.testing.assert_allclose(
        np.asarray(jf(jnp.asarray(x), jnp.asarray(y)), np.float32),
        nf(x, y), rtol=1e-5, atol=1e-6, err_msg=f"{name} fw")
    if name in ("add", "mul", "div"):     # differentiable subset
        idx = tuple(data.draw(st.integers(0, s - 1)) for s in x.shape)
        fn_idx = lambda a, b: jf(a, b)[idx]     # see one-arg note on sums
        g = jax.grad(fn_idx, argnums=(0, 1))(
            jnp.asarray(x), jnp.asarray(y))
        for arg in (0, 1):
            num = central_difference(fn_idx, jnp.asarray(x), jnp.asarray(y),
                                     arg=arg, idx=idx)
            np.testing.assert_allclose(float(g[arg][idx]), num,
                                       rtol=1e-2, atol=1e-2,
                                       err_msg=f"{name} grad arg{arg}")


@given(st.sampled_from(sorted(_REDUCE)), strided_view(), st.data())
@settings(max_examples=60, deadline=None)
def test_op_zoo_reduce(name, x, data):
    jf, nf = _REDUCE[name]
    axis = data.draw(st.integers(0, x.ndim - 1))
    np.testing.assert_allclose(
        np.asarray(jf(jnp.asarray(x), axis=axis), np.float32),
        nf(x.astype(np.float64), axis=axis).astype(np.float32),
        rtol=1e-4, atol=1e-5, err_msg=f"{name} over axis {axis}")
