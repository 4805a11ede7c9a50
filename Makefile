# Developer shortcuts
test:          ## full suite on the 8-device virtual CPU mesh
	python -m pytest tests/ -q

test-fast:     ## quick tier (skips multi-minute integration tests)
	python -m pytest tests/ -q -m "not slow"

bench:         ## headline benchmark on the attached TPU
	python bench.py

demo:          ## 2-D VQ clustering demos -> PNGs in examples/
	cd examples && python vq_2d_clustering.py && python vq_balanced_2d.py

smoke:         ## full-scale training smoke on the TPU
	python scripts/smoke_run_tpu.py

quality:       ## hardware quality gate (3-seed jitter12, ARI/AMI/NMI)
	python scripts/quality_run_tpu.py

bench-decode:  ## single-stream AR decode configurations on the TPU
	python scripts/bench_decode_tpu.py

profile-encode: ## component-level encode profile on the TPU
	python scripts/profile_encode_tpu.py

.PHONY: test test-fast bench demo smoke quality bench-decode profile-encode
