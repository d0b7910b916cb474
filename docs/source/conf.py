"""Sphinx configuration for dibs-tpu API docs."""
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "dibs-tpu"
author = "dibs-tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

autodoc_typehints = "description"
napoleon_google_docstring = True
html_theme = "alabaster"
exclude_patterns = []
