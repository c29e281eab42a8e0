"""Docs-tree integrity (sphinx is not in the build image, so instead of
building we validate the things a sphinx build would catch: every
toctree target exists, every automodule target imports, and conf.py
executes).  Keeps docs/ buildable-by-construction."""

import os
import re

import pytest

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs", "source")


def _rst_files():
    return [f for f in os.listdir(DOCS) if f.endswith(".rst")]


def test_conf_executes():
    conf = os.path.join(DOCS, "conf.py")
    ns = {"__file__": conf}
    with open(conf) as f:
        exec(compile(f.read(), conf, "exec"), ns)
    assert ns["project"] == "lenslesspicam_tpu"
    assert "sphinx.ext.autodoc" in ns["extensions"]


def test_toctree_targets_exist():
    index = open(os.path.join(DOCS, "index.rst")).read()
    block = index[index.index(".. toctree::"):]
    targets = [ln.strip() for ln in block.splitlines()[1:]
               if ln.strip() and not ln.strip().startswith(":")
               and not ln.startswith(".. ")]
    # targets run until the first non-indented section
    targets = [t for t in targets if re.fullmatch(r"[a-z_]+", t)]
    assert len(targets) >= 8
    for t in targets:
        assert os.path.exists(os.path.join(DOCS, f"{t}.rst")), t


def test_automodule_targets_import():
    import importlib

    pat = re.compile(r"^\.\. automodule:: ([\w.]+)", re.M)
    members_pat = re.compile(
        r"^\.\. automodule:: ([\w.]+)\n(?:   :members: ([^\n]*(?:\n             [^\n]*)*))?",
        re.M)
    seen = set()
    for fname in _rst_files():
        text = open(os.path.join(DOCS, fname)).read()
        for m in members_pat.finditer(text):
            modname, members = m.group(1), m.group(2)
            mod = importlib.import_module(modname)
            seen.add(modname)
            if members:
                for name in re.split(r"[,\s]+", members.strip()):
                    if name:
                        assert hasattr(mod, name), f"{modname}.{name}"
    assert len(seen) >= 25  # the API surface is actually covered
