# Runner targets (component C19 equivalent: the reference shipped docker +
# grid scripts; here plain make against the baked environment).

PY ?= python
DATA ?= /tmp/vistaocr_data
RUN ?= /tmp/vistaocr_run

.PHONY: test test-fast bench synth-data train-smoke infer-smoke native \
    quality-hw iam-e2e madcat-e2e soak clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q --ignore=tests/test_train.py \
	    --ignore=tests/test_service.py --ignore=tests/test_farsi_e2e.py \
	    --ignore=tests/test_multihost.py

bench:
	$(PY) bench.py

synth-data:
	$(PY) -m vistaocr_tpu.data.synth --out $(DATA) --language en \
	    --num-train 2048 --num-val 256 --num-test 256

train-smoke: synth-data
	$(PY) -m vistaocr_tpu.train --preset synth-tiny --platform cpu \
	    --data-dir $(DATA) --snapshot-dir $(RUN) --max-steps 300

infer-smoke:
	$(PY) -m vistaocr_tpu.infer --snapshot $(RUN)/best --data $(DATA) \
	    --split test --platform cpu

native:
	$(PY) -c "from vistaocr_tpu.decode import native_binding as nb; \
	    print('native ok' if nb.available() else nb.build_error())"

# Corpus-scale evidence runs (real chip; see docs/design.md for the
# recorded results of each)
quality-hw:
	$(PY) scripts/quality_run.py --kind handwriting --out /tmp/vistaocr_hw

iam-e2e:
	$(PY) scripts/iam_e2e.py --out /tmp/vistaocr_iam_e2e

madcat-e2e:
	$(PY) scripts/madcat_e2e.py --out /tmp/vistaocr_madcat_e2e

soak:
	$(PY) scripts/soak_service.py --snapshot $(RUN)/best --seconds 300

clean:
	rm -rf vistaocr_tpu/decode/native/_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
