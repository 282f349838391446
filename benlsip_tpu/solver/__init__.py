"""Solver layers: projected CG, inner step, TR subproblem, outer AL driver."""
