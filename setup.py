"""Thin setuptools shim (metadata lives in pyproject.toml).

Kept, like the reference's own setup.py, so environments without the
``wheel`` package (PEP 517 editable builds need it) can still do a legacy
``python setup.py develop`` / ``pip install -e . --use-pep517=no`` install.
"""

from setuptools import setup

setup()
