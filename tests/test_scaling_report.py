"""bench_scaling.py: HLO collective parser + the DP zero-exchange claim.

The scaling report's numbers come from regex-walking optimized HLO; pin the
parser on literal fixtures and on a real compiled sharded program.
"""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench_scaling import collective_stats  # noqa: E402


def test_collective_stats_on_literal_hlo():
    hlo = """
  %all-reduce.3 = f32[2048]{0} all-reduce(%add.7), replica_groups={{0,1}}
  %all-reduce.9 = pred[] all-reduce(%or.2), replica_groups={{0,1}}
  %ag = f32[16,4]{1,0} all-gather(%p0), dimensions={0}
  %rs = f64[512]{0} reduce-scatter(%x), dimensions={0}
  %cp = bf16[8]{0} collective-permute(%y), source_target_pairs={{0,1}}
  %add.1 = f32[2048]{0} add(%a, %b)
"""
    counts, nbytes = collective_stats(hlo)
    assert counts == {
        "all-reduce": 2,
        "all-gather": 1,
        "reduce-scatter": 1,
        "collective-permute": 1,
    }
    # 2048*4 + 1 (pred scalar) + 64*4 + 512*8 + 8*2
    assert nbytes == 2048 * 4 + 1 + 64 * 4 + 512 * 8 + 8 * 2


def test_collective_stats_ignores_noncollectives():
    counts, nbytes = collective_stats("%d = f32[4]{0} dot(%a, %b)")
    assert counts == {} and nbytes == 0


@pytest.mark.slow
def test_dp_compiled_program_has_no_data_collectives():
    # Real compiled DP program on an 8-way ('batch',) mesh: every collective
    # must be a scalar pred all-reduce (loop predicate), never array data.
    from bench_scaling import compile_dp

    compiled, _ = compile_dp(64, 8)
    counts, nbytes = collective_stats(compiled.as_text())
    assert set(counts) <= {"all-reduce"}
    assert nbytes <= sum(counts.values())  # ≤ 1 byte per collective
