#!/bin/sh
# The builder's close gate: the FULL suite (fast + slow) in one run.
# pytest.ini's addopts excludes `slow` for the driver's bounded verify
# window; this override re-includes everything.
exec python -m pytest tests/ -q -m "" "$@"
