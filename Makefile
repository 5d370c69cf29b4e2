.PHONY: test native serve-direct serve-queued bench bench-serving bench-train data lint gate

# Standing accuracy regression gate (VERDICT r3 item 5): trains gated fusion
# end-to-end on the strong-signal synthetic corpus, asserts actor-held-out
# test acc >= 0.70. Run every round; record the JSON line in
# benchmarks/RESULTS.md next to the throughput headline.
gate:
	python tools/convergence_gate.py

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
