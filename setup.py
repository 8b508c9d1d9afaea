"""Shim for tooling that still invokes setup.py directly (pip installs
read pyproject.toml). Also builds the optional C++ host library so
`pip install .` ships the native fast paths pre-compiled when a
toolchain is present (advanced_rag_tpu/native/__init__.py falls back to
the pure-Python implementations otherwise)."""

from setuptools import setup

setup()
