"""Roofline accounting: judge a measured kernel time against what the chip
could possibly do for that op's FLOPs and HBM bytes.

The reference's harness reports only speedup-vs-baseline
(test_utils.py:190-217); a speedup says nothing about headroom.  The
roofline model does: an op needing F FLOPs and moving B bytes cannot finish
faster than ``max(F / peak_flops, B / peak_bandwidth)``; the achieved
fraction of that bound is the honest "how good is this kernel" number, and
which term dominates says whether to optimize compute or traffic.

Two ceilings matter on this setup (bench/RESULTS.md): the v5e datasheet
(197 bf16 TFLOP/s, 820 GB/s HBM) and the tunnel-calibrated achievable
ceiling measured with a pure matmul / pure-stream probe (~88 TFLOP/s,
~260 GB/s as of 2026-08) — kernels should be judged against the calibrated
one, since no kernel can beat the chip's own matmul.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Ceiling:
    name: str
    tflops: float          # peak usable compute, TFLOP/s
    gbs: float             # peak usable HBM bandwidth, GB/s


V5E_SPEC = Ceiling("v5e-spec", tflops=197.0, gbs=820.0)
# calibrated on the tunneled chip with a large bf16 matmul and a pure
# HBM-stream probe; re-measure with bench/check_fa.py if the pool changes
TUNNEL_2026_08 = Ceiling("tunnel-2026-08", tflops=88.0, gbs=260.0)


@dataclasses.dataclass(frozen=True)
class RooflinePoint:
    time_ms: float
    flops: float
    bytes: float
    ceiling: Ceiling

    @property
    def ideal_ms(self) -> float:
        """Fastest possible time: compute-bound or bandwidth-bound floor."""
        t_flops = self.flops / (self.ceiling.tflops * 1e12)
        t_bytes = self.bytes / (self.ceiling.gbs * 1e9)
        return max(t_flops, t_bytes) * 1e3

    @property
    def bound(self) -> str:
        t_flops = self.flops / (self.ceiling.tflops * 1e12)
        t_bytes = self.bytes / (self.ceiling.gbs * 1e9)
        return "compute" if t_flops >= t_bytes else "memory"

    @property
    def fraction(self) -> float:
        """Achieved fraction of the roofline bound (1.0 = speed of light)."""
        return self.ideal_ms / self.time_ms if self.time_ms > 0 else 0.0

    @property
    def achieved_tflops(self) -> float:
        return self.flops / (self.time_ms * 1e-3) / 1e12

    @property
    def achieved_gbs(self) -> float:
        return self.bytes / (self.time_ms * 1e-3) / 1e9

    def summary(self) -> dict:
        return {
            "time_ms": round(self.time_ms, 4),
            "tflops": round(self.achieved_tflops, 2),
            "gbs": round(self.achieved_gbs, 1),
            "bound": self.bound,
            "roofline_frac": round(self.fraction, 3),
            "ceiling": self.ceiling.name,
        }


def roofline(time_ms: float, flops: float, bytes_: float,
             ceiling: Ceiling = TUNNEL_2026_08) -> RooflinePoint:
    return RooflinePoint(time_ms, flops, bytes_, ceiling)


# --------------------------------------------------------------------- ops
def attention_bytes(B: int, H: int, L: int, d: int, *, dtype_bytes: int = 2,
                    fwd_and_bwd: bool = False) -> float:
    """HBM traffic of flash attention: Q/K/V read + O written (+ in the
    backward: Q/K/V/O/dO read and dQ/dK/dV written; LSE is negligible).
    Flash never materializes [L, L], so traffic is linear in L."""
    qkv_o = 4.0 * B * H * L * d * dtype_bytes
    if not fwd_and_bwd:
        return qkv_o
    bwd = 8.0 * B * H * L * d * dtype_bytes
    return qkv_o + bwd


def decode_attention_bytes(B: int, H: int, S: int, d: int, *,
                           cache_bytes: int = 2, scale_heads: int = 0
                           ) -> float:
    """Decode step traffic ~= the whole K and V cache streamed once (the
    query/output are [B, H, d] — noise).  ``scale_heads``: per-position
    fp32 scale rows for quantized caches."""
    kv = 2.0 * B * S * H * d * cache_bytes
    scales = 2.0 * B * scale_heads * S * 4.0
    return kv + scales


def weight_matmul_bytes(M: int, K: int, N: int, *, weight_bytes: float,
                        act_bytes: int = 2) -> float:
    """Weight-dominated matmul traffic (decode regime: M small, weights
    stream once); ``weight_bytes`` may be fractional (0.5 for int4)."""
    return K * N * weight_bytes + (M * K + M * N) * act_bytes
