# Convenience targets. See .claude/skills/verify/SKILL.md for env gotchas.

.PHONY: test test-fast native bench bench-pallas tpu-kernels proxy clean

test:            ## full CPU suite (8 virtual devices; skips the TPU claim)
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q

test-fast:       ## everything except the slow integration tests
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q \
	    --deselect tests/train/test_fault_injection.py

native:          ## build the C++ host components
	$(MAKE) -C csrc

bench:           ## headline benchmark on the real TPU (one JSON line)
	python bench.py

bench-pallas:    ## same, through the Pallas kernel path
	python bench.py --kernels pallas

tpu-kernels:     ## compiled Pallas kernel validation on the real TPU
	python tests_tpu/run_pallas_tpu.py

proxy:           ## re-measure the torch-CPU proxy denominator
	PALLAS_AXON_POOL_IPS= python -m bench.proxy_torch --steps 2

clean:
	$(MAKE) -C csrc clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
