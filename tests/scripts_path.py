"""Make the repo root importable so tests can reuse fixture-generation
code from ``scripts/`` (kept as a module to avoid sys.path noise in
every test file)."""
import os
import sys

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _root not in sys.path:
    sys.path.insert(0, _root)


def add_scripts_path():
    return _root
