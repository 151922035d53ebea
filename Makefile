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
	python benchmarks/reseed_bench_cache.py  # no-op unless the wipe took last_full_bench.json
	@leann --help > /dev/null && echo "setup ok: leann on PATH, csrc built"

# Rebuild the cached bench tiers a fresh machine is missing, SERIALLY (the
# tiers share one TPU and one host core; parallel launches contend). Every
# step is resumable (phase checkpoints / out-dir persistence) — rerunning the
# chain continues where it stopped. ~5 min (100K) + ~35 min (DPR 2.1M) +
# ~85 min (10M) + ~4 h (20M) warm.
warm-caches:
	nohup bash benchmarks/warm_chain.sh >> /tmp/chain.log 2>&1 &
	@echo "cache chain launched: tail -f /tmp/chain.log"

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	$(MAKE) -C csrc clean
