"""docs/API.md drift guard: every backticked symbol documented in a
module section's table must resolve in that module (or be a dotted path
from the package root), and every documented CLI must be importable.
Docs that promise symbols that don't exist send users into ImportErrors
— this pins the doc to the code."""

import importlib
import re

import pytest

API_MD = "docs/API.md"


def _rows():
    section = None
    for line in open(API_MD):
        m = re.match(r"^## `(avsl_tpu\.[a-z]+)`", line)
        if m:
            section = m.group(1)
            continue
        if line.startswith("## CLI"):
            section = "cli"
            continue
        if section and line.startswith("| `"):
            first = line.split("|")[1]
            for sym in re.findall(r"`([^`]+)`", first):
                yield section, sym.strip()


def _resolvable(section: str, sym: str) -> bool:
    # strip call/usage decorations the docs use
    sym = sym.split("(")[0].strip()
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", sym):
        return True  # prose-ish cell (e.g. flags), not a symbol claim
    if sym.endswith("."):
        return True
    parts = sym.split(".")
    candidates = [(section, parts)]
    if len(parts) > 1:
        candidates.append(("avsl_tpu", parts))
    for mod_name, attrs in candidates:
        try:
            obj = importlib.import_module(mod_name)
        except ImportError:
            continue
        ok = True
        for a in attrs:
            if hasattr(obj, a):
                obj = getattr(obj, a)
            else:
                try:
                    obj = importlib.import_module(
                        f"{mod_name}.{'.'.join(attrs[:attrs.index(a)+1])}"
                    )
                except ImportError:
                    ok = False
                    break
        if ok:
            return True
    return False


def test_api_md_symbols_resolve():
    missing = []
    for section, sym in _rows():
        if section == "cli":
            name = sym.split()[0].split("(")[0]
            if not re.fullmatch(r"[a-z_][a-z0-9_]*", name):
                continue
            try:
                importlib.import_module(f"avsl_tpu.cli.{name}")
            except ImportError:
                missing.append(f"cli.{name}")
            continue
        if not _resolvable(section, sym):
            missing.append(f"{section}.{sym}")
    assert not missing, f"documented but unresolvable: {missing}"
