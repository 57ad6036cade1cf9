#!/usr/bin/env python
"""Spelling gate for docs and docstrings (reference parity: the upstream CI
runs a Sphinx spelling job — /root/reference/Makefile `spelling` target,
.github/workflows/ci.yml).  No spelling tool ships in this environment, so
this is a self-contained codespell-style checker: a dictionary of common
misspellings scanned over Markdown docs, README/CHANGELOG, and every
docstring in the package.  Exit 1 on any hit.

Usage: python docs/spellcheck.py [--fix]
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# Common misspellings -> corrections (codespell-style; subset relevant to
# technical prose).  Keys are matched case-insensitively on word boundaries.
MISSPELLINGS = {
    "accross": "across",
    "achive": "achieve",
    "acheive": "achieve",
    "adress": "address",
    "agregate": "aggregate",
    "alot": "a lot",
    "aquire": "acquire",
    "arbitary": "arbitrary",
    "assertation": "assertion",
    "asssert": "assert",
    "begining": "beginning",
    "behaviour-": "behavior-",
    "benhmark": "benchmark",
    "benchamrk": "benchmark",
    "boundries": "boundaries",
    "calcualte": "calculate",
    "cancelation": "cancellation",
    "cant": "can't",
    "collison": "collision",
    "colision": "collision",
    "commited": "committed",
    "comparision": "comparison",
    "compatability": "compatibility",
    "completly": "completely",
    "concurent": "concurrent",
    "consistant": "consistent",
    "continous": "continuous",
    "controled": "controlled",
    "convertion": "conversion",
    "coordiante": "coordinate",
    "definately": "definitely",
    "dependancy": "dependency",
    "dependant": "dependent",
    "deterministc": "deterministic",
    "diferent": "different",
    "dimenson": "dimension",
    "docuemnt": "document",
    "enviroment": "environment",
    "enviornment": "environment",
    "envrionment": "environment",
    "existance": "existence",
    "explicity": "explicitly",
    "finaly": "finally",
    "fucntion": "function",
    "funciton": "function",
    "guarentee": "guarantee",
    "guarante": "guarantee",
    "happend": "happened",
    "identicial": "identical",
    "immediatly": "immediately",
    "implemenation": "implementation",
    "implmentation": "implementation",
    "independant": "independent",
    "infered": "inferred",
    "initalize": "initialize",
    "initilize": "initialize",
    "interger": "integer",
    "intergration": "integration",
    "lenght": "length",
    "liason": "liaison",
    "libary": "library",
    "managment": "management",
    "mesage": "message",
    "mispell": "misspell",
    "neccessary": "necessary",
    "necesary": "necessary",
    "occured": "occurred",
    "occurence": "occurrence",
    "ocurred": "occurred",
    "offical": "official",
    "optimzation": "optimization",
    "overriden": "overridden",
    "paralell": "parallel",
    "parrallel": "parallel",
    "parralel": "parallel",
    "peformance": "performance",
    "perfomance": "performance",
    "performace": "performance",
    "persistant": "persistent",
    "posible": "possible",
    "postion": "position",
    "preceeding": "preceding",
    "probabilty": "probability",
    "proccess": "process",
    "propogate": "propagate",
    "recieve": "receive",
    "refered": "referred",
    "referene": "reference",
    "relevent": "relevant",
    "repostory": "repository",
    "reproducable": "reproducible",
    "seperate": "separate",
    "similiar": "similar",
    "succesful": "successful",
    "sucessful": "successful",
    "succes": "success",
    "supress": "suppress",
    "teh": "the",
    "therfore": "therefore",
    "threshhold": "threshold",
    "tolerence": "tolerance",
    "trajectoy": "trajectory",
    "transfered": "transferred",
    "truely": "truly",
    "unecessary": "unnecessary",
    "unkown": "unknown",
    "untill": "until",
    "usefull": "useful",
    "vaild": "valid",
    "verison": "version",
    "wich": "which",
    "wieght": "weight",
    "wihtout": "without",
}

WORD_RE = re.compile(
    "|".join(rf"\b{re.escape(w)}\b" for w in MISSPELLINGS), re.IGNORECASE
)

DOC_GLOBS = ["docs/*.md", "*.md"]
PKG = ROOT / "gymnasium_planar_robotics_tpu"


def _scan_text(path: Path, text: str) -> list[tuple[Path, int, str, str]]:
    hits = []
    for lineno, line in enumerate(text.splitlines(), 1):
        for m in WORD_RE.finditer(line):
            hits.append((path, lineno, m.group(0), MISSPELLINGS[m.group(0).lower()]))
    return hits


def _docstrings(path: Path) -> str:
    """All docstrings of a Python file, joined (line numbers not preserved)."""
    try:
        tree = ast.parse(path.read_text())
    except SyntaxError:
        return ""
    out = []
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.Module, ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef)
        ):
            doc = ast.get_docstring(node, clean=False)
            if doc:
                out.append(doc)
    return "\n".join(out)


def main() -> int:
    hits: list[tuple[Path, int, str, str]] = []
    for pattern in DOC_GLOBS:
        for path in sorted(ROOT.glob(pattern)):
            hits += _scan_text(path, path.read_text())
    for path in sorted(PKG.rglob("*.py")):
        hits += _scan_text(path, _docstrings(path))

    if "--fix" in sys.argv and hits:
        for path in {h[0] for h in hits}:
            text = path.read_text()
            text = WORD_RE.sub(lambda m: MISSPELLINGS[m.group(0).lower()], text)
            path.write_text(text)
        print(f"spellcheck: fixed {len(hits)} hit(s)")
        return 0

    for path, lineno, word, fix in hits:
        print(f"{path.relative_to(ROOT)}:{lineno}: {word!r} -> {fix!r}")
    if hits:
        print(f"spellcheck: {len(hits)} misspelling(s) found")
        return 1
    print("spellcheck: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
