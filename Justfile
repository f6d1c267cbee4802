test:
    python -m pytest tests/ -q

bench:
    python bench.py

native:
    make -C native

serve:
    python -m sopro_tpu.serve.server_stdlib

fmt:
    python -m isort sopro_tpu tests && python -m black sopro_tpu tests
