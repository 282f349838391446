"""Roofline accounting: achieved FLOP/s and HBM bandwidth vs chip peaks.

The BASELINE north star asks for the per-iteration QR/PCG step at
"speed-of-light per chip"; this module makes that claim quantitative
(round-1 VERDICT item 4: no MFU/roofline number existed anywhere).

Peaks are the public TPU v5e (v5 lite) figures; pass your own `ChipPeaks`
for other hardware.  f32 matmuls on the MXU run as bf16 passes:
`matmul_precision="default"` is 1 pass, "highest" (the solver default —
see SolverOptions.matmul_precision) uses 6 passes, so the *attainable*
f32 peak under the solver's precision contract is peak_bf16/6.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ChipPeaks:
    name: str
    bf16_tflops: float       # MXU peak, bf16 inputs / f32 accumulate
    hbm_gbps: float          # HBM bandwidth
    f32_passes: int = 6      # bf16 passes per f32 matmul at "highest"

    @property
    def f32_highest_tflops(self) -> float:
        return self.bf16_tflops / self.f32_passes


# Public v5e figures: 197 TFLOP/s bf16, 819 GB/s HBM.
V5E = ChipPeaks(name="v5e", bf16_tflops=197.0, hbm_gbps=819.0)


@dataclasses.dataclass(frozen=True)
class RooflineRow:
    """One measured kernel/phase against the roofline."""

    phase: str
    flops: float             # executed FLOPs (analytic count)
    bytes_moved: float       # HBM traffic (analytic count)
    wall_s: float
    peaks: ChipPeaks = V5E
    precision: str = "highest"   # "highest" -> f32 6-pass peak; "bf16" -> raw

    @property
    def tflops_achieved(self) -> float:
        return self.flops / self.wall_s / 1e12 if self.wall_s else 0.0

    @property
    def gbps_achieved(self) -> float:
        return self.bytes_moved / self.wall_s / 1e9 if self.wall_s else 0.0

    @property
    def peak_tflops(self) -> float:
        return (
            self.peaks.bf16_tflops
            if self.precision == "bf16"
            else self.peaks.f32_highest_tflops
        )

    @property
    def mfu(self) -> float:
        """Fraction of the precision-adjusted matmul peak."""
        return self.tflops_achieved / self.peak_tflops

    @property
    def bw_util(self) -> float:
        return self.gbps_achieved / self.peaks.hbm_gbps

    @property
    def arithmetic_intensity(self) -> float:
        return self.flops / self.bytes_moved if self.bytes_moved else float("inf")

    @property
    def ridge_intensity(self) -> float:
        """FLOP/byte at which this chip turns compute-bound."""
        return self.peak_tflops * 1e12 / (self.peaks.hbm_gbps * 1e9)

    @property
    def bound(self) -> str:
        return "compute" if self.arithmetic_intensity >= self.ridge_intensity else "bandwidth"

    @property
    def sol_frac(self) -> float:
        """Speed-of-light fraction: achieved / min(compute, bandwidth) limit.

        The roofline time floor is max(flops/peak_flops, bytes/peak_bw);
        sol_frac = floor / wall — 1.0 means the kernel runs at the hardware
        limit for its intensity.
        """
        t_comp = self.flops / (self.peak_tflops * 1e12)
        t_bw = self.bytes_moved / (self.peaks.hbm_gbps * 1e9)
        floor = max(t_comp, t_bw)
        return floor / self.wall_s if self.wall_s else 0.0

    def as_dict(self) -> dict:
        return {
            "phase": self.phase,
            "flops": self.flops,
            "bytes": self.bytes_moved,
            "wall_s": round(self.wall_s, 6),
            "tflops": round(self.tflops_achieved, 3),
            "gbps": round(self.gbps_achieved, 1),
            "mfu": round(self.mfu, 4),
            "bw_util": round(self.bw_util, 4),
            "bound": self.bound,
            "sol_frac": round(self.sol_frac, 4),
            "chip": self.peaks.name,
        }
