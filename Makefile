# Fresh-machine bootstrap + common dev targets.
#
# Rounds start on wiped machines: the editable install, the csrc .so files,
# and the bench caches all have to be recreated. `make setup` does the first
# two in seconds; `make warm-caches` launches the (resumable, ~40 min)
# bench-tier rebuilds in the background.

.PHONY: setup warm-caches test bench clean

setup:
	pip install -e . --no-deps --no-build-isolation -q  # zero-egress image: no pypi
	$(MAKE) -C csrc
	@leann --help > /dev/null && echo "setup ok: leann on PATH, csrc built"

# Rebuild the cached bench tiers a fresh machine is missing. Both are
# resumable (phase checkpoints) and safe to re-run; they share the single
# TPU through the axon tunnel. ~6 min (100K) + ~35 min (DPR 2.1M) warm.
warm-caches:
	nohup python benchmarks/scale_10m.py --n-chunks 2100000 --graph-degree 32 \
	  --out-dir $(HOME)/.cache/leann_tpu_bench/dpr21m_r32 \
	  > /tmp/warm_dpr.log 2>&1 &
	nohup python -c "import sys; sys.path[:0]=['.','benchmarks']; \
	  from bench import ensure_tier2; ensure_tier2()" \
	  > /tmp/warm_tier2.log 2>&1 &
	@echo "cache warms launched: tail -f /tmp/warm_dpr.log /tmp/warm_tier2.log"

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	$(MAKE) -C csrc clean
