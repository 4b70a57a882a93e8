"""Root conftest: opt-in xdist parallelism.

``-n 2`` roughly halves suite wall time on this 2-core box, but hardcoding
it in ``addopts`` makes a plain ``pip install .`` + ``pytest`` (without the
optional ``test`` extra that declares pytest-xdist) abort at startup with
"unrecognized arguments: -n".  Inject it here instead, only when xdist is
actually importable and the user didn't pick a worker count themselves.
"""


def pytest_load_initial_conftests(early_config, parser, args):
    try:
        import xdist  # noqa: F401
    except ImportError:
        return
    if any(a == "-n" or a.startswith("-n") or a.startswith("--numprocesses")
           for a in args):
        return
    args[:] = ["-n", "2"] + args
