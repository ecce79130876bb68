"""Sphinx configuration (mirrors the reference's docs/ RTD setup)."""
project = "torchsparsegradutils-tpu"
author = "torchsparsegradutils-tpu contributors"
release = "0.1.0"
extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "myst_parser",
]
source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
html_theme = "alabaster"
