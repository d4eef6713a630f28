# voxtral_tpu developer targets (parity with the reference Makefile).

PY ?= python

.PHONY: test test-fast lint bench e2e-bench wer serve convert clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

lint:
	$(PY) -m compileall -q voxtral_tpu benches scripts
	$(PY) scripts/lint.py
	@command -v ruff >/dev/null 2>&1 \
	    && ruff check --select F,E9 voxtral_tpu benches scripts tests \
	    || echo "ruff not installed; ran scripts/lint.py only (CI runs ruff)"

# Headline driver benchmark (one JSON line; runs on the default backend).
bench:
	$(PY) bench.py

# Stage-timed benchmark with JSON report.
e2e-bench:
	$(PY) benches/e2e_bench.py --random-weights --json e2e_report.json

# WER eval against a local dir of wav/txt pairs:
#   make wer WER_ARGS="--local-dir data --model models/voxtral"
wer:
	$(PY) scripts/eval_wer.py $(WER_ARGS)

serve:
	$(PY) -m voxtral_tpu.serving.server --random-weights

convert:
	$(PY) scripts/convert_to_gguf.py $(MODEL_DIR) $(OUT)

profile:
	$(PY) benches/e2e_bench.py --random-weights --seconds 4 --iterations 1

clean:
	rm -rf __pycache__ */__pycache__ */*/__pycache__ .pytest_cache \
	    e2e_report.json wer_report.json wer_eval_work
