"""Offline docs validation: what a sphinx build would catch, without
sphinx.

This environment has no sphinx/docutils and no package installs, so the
full HTML build runs only in CI (``.github/workflows/docs.yml``).  This
script validates the failure modes a sphinx run would surface:

* every ``automodule`` / ``autofunction`` / ``autoclass`` target imports
  and resolves;
* every ``toctree`` entry points at an existing source document;
* every ``:doc:`` / ``:ref:`` style internal document reference resolves;
* rst structural sanity: section underlines at least as long as their
  titles, balanced ``code-block`` directives.

Run: ``python docs/validate_docs.py`` (exit 0 = pass).  Also executed by
``tests/test_docs_build.py`` so the suite keeps the docs green.
"""

from __future__ import annotations

import importlib
import pathlib
import re
import sys

SRC = pathlib.Path(__file__).parent / "source"
REPO = pathlib.Path(__file__).parent.parent
if str(REPO) not in sys.path:  # run from anywhere, like conf.py does
    sys.path.insert(0, str(REPO))


def fail(msg, problems):
    problems.append(msg)


def iter_rst():
    return sorted(SRC.rglob("*.rst"))


def check_autodoc(problems):
    pat = re.compile(
        r"^\.\.\s+(automodule|autofunction|autoclass)::\s+(\S+)",
        re.M)
    for f in iter_rst():
        for kind, target in pat.findall(f.read_text()):
            try:
                if kind == "automodule":
                    importlib.import_module(target)
                else:
                    mod, _, attr = target.rpartition(".")
                    obj = importlib.import_module(mod)
                    if not hasattr(obj, attr):
                        fail(f"{f.name}: {kind} target {target!r} not "
                             f"found in {mod}", problems)
            except Exception as e:  # noqa: BLE001
                fail(f"{f.name}: {kind} target {target!r} failed to "
                     f"import ({type(e).__name__}: {e})", problems)


def check_toctrees(problems):
    for f in iter_rst():
        lines = f.read_text().splitlines()
        in_toc = False
        for ln in lines:
            if re.match(r"^\.\.\s+toctree::", ln):
                in_toc = True
                continue
            if in_toc:
                if ln.strip().startswith(":") or not ln.strip():
                    if not ln.strip() and in_toc == "body":
                        in_toc = False
                    continue
                if ln.startswith((" ", "\t")):
                    in_toc = "body"
                    entry = ln.strip()
                    tgt = (f.parent / f"{entry}.rst")
                    if not tgt.exists():
                        fail(f"{f.name}: toctree entry {entry!r} has no "
                             f"{tgt.relative_to(SRC)}", problems)
                else:
                    in_toc = False


def check_doc_refs(problems):
    pat = re.compile(r":doc:`([^`<]*?)(?:<([^>]+)>)?`")
    for f in iter_rst():
        for label, explicit in pat.findall(f.read_text()):
            target = explicit or label
            target = target.strip()
            if target.startswith("/"):
                tgt = SRC / f"{target[1:]}.rst"
            else:
                tgt = f.parent / f"{target}.rst"
            if not tgt.exists():
                fail(f"{f.name}: :doc: reference {target!r} unresolved",
                     problems)


def check_sections(problems):
    for f in iter_rst():
        lines = f.read_text().splitlines()
        for i in range(len(lines) - 1):
            title, under = lines[i], lines[i + 1]
            if (title.strip() and under
                    and re.fullmatch(r"([=\-~^\"+#*])\1{2,}", under)
                    and len(under) < len(title.rstrip())):
                fail(f"{f.name}:{i + 2}: section underline shorter than "
                     f"title {title.strip()!r}", problems)


def main() -> int:
    problems: list[str] = []
    check_autodoc(problems)
    check_toctrees(problems)
    check_doc_refs(problems)
    check_sections(problems)
    n_files = len(list(iter_rst()))
    if problems:
        print(f"docs validation: {len(problems)} problem(s) in "
              f"{n_files} rst files")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(f"docs validation: OK ({n_files} rst files; autodoc targets "
          "import, toctrees and :doc: refs resolve, sections well-formed)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
