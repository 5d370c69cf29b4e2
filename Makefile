.PHONY: test native serve-direct serve-queued bench bench-serving bench-train data lint

test:
	python -m pytest tests/ -q

native:
	python -m multimodalemotionrecognition_tpu.native.build

serve-direct:
	python -m multimodalemotionrecognition_tpu.serving.server_direct --port 8000

serve-queued:
	python -m multimodalemotionrecognition_tpu.serving.server_queued --port 8002

bench:
	python bench.py

bench-serving:
	python benchmarks/bench_serving.py

bench-train:
	python benchmarks/bench_train.py --mode step

data:
	python -m multimodalemotionrecognition_tpu.data.synthetic --root data_synthetic
