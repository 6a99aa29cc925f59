# Convenience targets. See CLAUDE.md for environment notes.
.PHONY: test native bench bench-quick smoke parity tpu-smoke stress clean

# Runs the 12 shipped configs against datasets under data/ and diffs the
# metrics against BASELINE.md; configs without data are SKIPPED.
parity:
	python benchmarks/parity.py

# Real-hardware kernel gate: every Pallas variant + one train step on the
# actual chip, numerics asserted against the XLA oracle. Seconds on a warm
# compile cache; run before trusting bench numbers after kernel changes.
tpu-smoke:
	timeout 1800 python benchmarks/tpu_smoke.py

# Production-scale stress: 1M-node/10M-edge LP + AM-scale NC on the chip.
stress:
	timeout 4200 python benchmarks/stress_lp.py
	timeout 4200 python benchmarks/stress_nc.py

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py

bench-quick:
	python bench.py --quick --cpu

smoke:
	python cli/classify_nodes.py --config configs/rgcn/nc-AIFB.yaml --synthetic --epochs 3 --cpu
	python cli/predict_links.py --config configs/rgcn/lp-FB-toy.yaml --synthetic --epochs 3 --cpu

clean:
	$(MAKE) -C native clean
	rm -rf .jax_cache
