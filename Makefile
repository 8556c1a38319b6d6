# Convenience targets. See .claude/skills/verify/SKILL.md for env gotchas.

.PHONY: test test-smoke test-all native bench bench-pallas tpu-kernels \
        tpu-fidelity tpu-session tpu-compare verify proxy clean

test:            ## CPU suite minus @slow (164 tests, 3m29s warm, 2026-08-17)
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -m "not slow"

test-smoke:      ## cold-checkout signal in <5 min (VERDICT r3 #9): the op/
	## kernel/data/loss layers, whose tests compile only small jit graphs.
	## The big WGAN-GP step graphs (tests/train, tests/parallel) compile
	## ~14 s EACH cold on this 1-core host — run `make test` after this
	## passes (or to prime .jax_cache; warm they reload in ~1.5 s).
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ops tests/data \
	  tests/losses tests/pallas tests/models tests/serve -m "not slow"

test-all:        ## the whole suite including the slow subprocess tests
	PALLAS_AXON_POOL_IPS= python -m pytest tests/

native:          ## build the C++ host components
	$(MAKE) -C csrc

bench:           ## headline benchmark on the real TPU (one JSON line)
	python bench.py

bench-pallas:    ## same, through the Pallas kernel path
	python bench.py --kernels pallas

tpu-kernels:     ## compiled Pallas kernel validation on the real TPU
	python tests_tpu/run_pallas_tpu.py

tpu-session:     ## every on-HW check in ONE chip claim (see skills/verify)
	python scripts/tpu_session.py

verify:          ## skills/verify drive flows, batched in ONE chip claim
	python scripts/verify_session.py

tpu-compare:     ## throttle-fair interleaved xla/pallas/mixed step compare
	python bench.py --compare

tpu-fidelity:    ## on-hardware fidelity witness vs CPU goldens ([B:5])
	python tests_tpu/run_fidelity_tpu.py

proxy:           ## re-measure the torch-CPU proxy denominator
	PALLAS_AXON_POOL_IPS= python -m bench.proxy_torch --steps 2

clean:
	$(MAKE) -C csrc clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
