# Sphinx configuration for lenslesspicam_tpu.
#
# Build with:  pip install sphinx furo && make -C docs html
# (sphinx is not baked into the TPU build image; tests/test_docs.py
# validates the tree structurally — toctree targets exist, automodule
# targets import — so the tree stays buildable without sphinx present.)

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))

project = "lenslesspicam_tpu"
author = "lenslesspicam_tpu contributors"
copyright = "2026, " + author

try:
    from lenslesspicam_tpu import __version__ as release
except Exception:  # pragma: no cover - docs build without the package
    release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
]

# heavy / host-only deps are mocked so autodoc imports cleanly on any
# builder (same spirit as the reference docs' autodoc_mock_imports)
autodoc_mock_imports = [
    "torch", "matplotlib", "cv2", "rawpy", "paramiko", "cadquery",
    "datasets", "huggingface_hub", "orbax",
]

napoleon_google_docstring = True
napoleon_numpy_docstring = True
autodoc_member_order = "bysource"

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
}

exclude_patterns = ["_build"]
html_theme = os.environ.get("SPHINX_THEME", "alabaster")
