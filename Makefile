# benlsip_tpu workflow targets (see CLAUDE.md for the full notes).

.PHONY: test tpu-smoke bench dryrun

# Full CPU suite (~15 min on the 2-core host; conftest forces CPU + x64).
test:
	python -m pytest tests/ -q

# 60-second real-chip sanity check (VERDICT r4 #8): the four compiled
# Mosaic kernel tests + one mini mixed-precision pipeline certify on the
# chip.  Run BEFORE a full bench whenever chip-path code changed.  First
# run after a code change pays the relay compile (~minutes); warm-cache
# repeats are ~1 min total.
tpu-smoke:
	BENLSIP_TPU_TESTS=1 python -m pytest tests/ -m tpu -q
	timeout 900 python scripts/tpu_smoke_pipeline.py

# Headline bench (the driver runs this on the real chip).
bench:
	python bench.py

# Multi-chip dry run on a virtual 8-device CPU mesh.
dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"
