# aec_tpu developer entry points
.PHONY: test bench benchmarks demo train-synthetic profile lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow" -k "not trainer and not generic"

bench:
	python bench.py

benchmarks:
	python -m benchmarks.baseline_configs

demo:
	python examples/demo_two_stage.py --out_dir demo_out

train-synthetic:
	python examples/train_synthetic.py

profile:
	python -m aec_tpu.cli.profile --models little_net,two_layer_gru,fullsubnet
