# Task-runner UX (≙ the reference's justfile, justfile:1-54)

PY ?= python

.PHONY: test test-all test-seq lint run run-debug bench native goldens clean

# ≙ `just test` (lib tests only, justfile:44-46)
test:
	$(PY) -m pytest tests/ -q --ignore=tests/test_integration_gltf.py

# ≙ `just test-all` (incl. integration, justfile:48-50)
test-all:
	$(PY) -m pytest tests/ -q

# ≙ `just test-seq` (single-threaded run, justfile:52-54)
test-seq:
	$(PY) -m pytest tests/ -q -p no:cacheprovider -x

# ≙ `just clippy` (strict lint, justfile:36-38): compile-check + import check
lint:
	$(PY) -m compileall -q renderer_rs_tpu bench.py __graft_entry__.py profile_frame.py probes
	$(PY) -c "import renderer_rs_tpu"

# ≙ `just run` (justfile:19-21) — headless demo frame
run:
	$(PY) -m renderer_rs_tpu.app.main --scene full --tris 4000 \
		--width 640 --height 480 --frames 1 --out out/

# ≙ `just run-debug` with verbose logging (RUST_LOG analog)
run-debug:
	RENDERER_LOG=debug,renderer_rs_tpu=debug $(PY) -m renderer_rs_tpu.app.main \
		--scene triangle --frames 1 --out out/ --log debug

bench:
	$(PY) bench.py

native:
	$(MAKE) -C native

goldens:
	REGEN_GOLDENS=1 $(PY) -m pytest tests/test_golden.py -q

clean:
	rm -rf out/ tests/.jax_cache .pytest_cache
	$(MAKE) -C native clean
