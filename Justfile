# quick CI lane (<5 min): parity/unit modules; the compile-heavy e2e,
# serving, parallel, and resident-kernel modules are marked `slow`
test:
    python -m pytest tests/ -q -m "not slow"

# everything (slow modules included; budget 15+ min on CPU)
test-all:
    python -m pytest tests/ -q

# real-hardware lane: Pallas kernels under the actual Mosaic lowering plus an
# on-chip end-to-end synthesize (results recorded in PARITY.md)
test-tpu:
    SOPRO_TEST_TPU=1 python -m pytest tests/ -q

bench:
    python bench.py

native:
    make -C native

serve:
    python -m sopro_tpu.serve.server_stdlib

fmt:
    python -m isort sopro_tpu tests && python -m black sopro_tpu tests
