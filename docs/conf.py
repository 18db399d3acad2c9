# Sphinx configuration for the disimpy_tpu documentation site.
#
# Mirrors the reference's docs form factor
# (/root/reference/docs/source/conf.py: sphinx site + executable
# tutorial/validation notebooks) on top of this repo's markdown docs and
# generated notebooks (docs/notebooks/, built by docs/make_notebooks.py).
#
# Build requirements (not part of the pinned runtime image):
#   pip install sphinx myst-parser nbsphinx
#   sphinx-build -b html docs docs/_build/html

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "disimpy_tpu"
author = "disimpy_tpu developers"
copyright = "2026, disimpy_tpu developers"

try:
    from disimpy_tpu import __version__ as release
except Exception:  # building docs without the runtime deps installed
    release = "0.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "myst_parser",
    "nbsphinx",
]

source_suffix = {
    ".rst": "restructuredtext",
    ".md": "markdown",
}

# The notebooks are pre-executed by make_notebooks.py (running them needs
# a TPU or a long CPU budget); the site build must not re-execute them.
nbsphinx_execute = "never"

exclude_patterns = ["_build", "make_notebooks.py"]
html_theme = "alabaster"
