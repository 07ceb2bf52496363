"""TPU-host test suite — intentionally NOT CPU-pinned (unlike tests/).

Run on the bench host:  python -m pytest tests_tpu/ -q
Off-TPU every test here skips; the hermetic CI suite stays `tests/`.
"""
