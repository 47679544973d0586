"""Build a >=100 MB NATURAL-LANGUAGE corpus from local sources.

The round-3 headline scale run used raw site-packages Python source --
self-similar code with no reference anchor (VERDICT r3 Weak #3).  This
tool builds the closest thing to an enwik-class corpus this box can
produce (zero egress): English PROSE extracted from machine-readable
sources, not program text:

  1. Google Cloud SDK API discovery JSONs: every "description" /
     "documentation" string field, JSON-unescaped (tens of MB of
     hand-written English API prose).
  2. Python docstrings, extracted via ast from every .py under the
     SDK + site-packages (prose only -- the code is discarded).
  3. All *.md / *.rst / *.txt documentation files on the box.

Dedup: exact paragraph-level (many vendored copies of the same license
/ README would otherwise let match models memorize repeats and make the
ratio meaningless -- the bench4m.raw lesson, tools/make_bench_corpus.py).

Deterministic: sources are sorted by path, so the corpus is
reproducible on this image.  Output: testdata/text100m.raw (gitignored;
regenerate with `python tools/make_text_corpus.py`).
"""

import ast
import glob
import hashlib
import io
import json
import os
import re
import sys

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "testdata", "text100m.raw")
TARGET = 110 << 20

_seen_par = set()


def _dedup_paragraphs(text):
    """Keep only paragraphs never emitted before (exact, whitespace-
    normalized match)."""
    out = []
    for par in text.split("\n\n"):
        key = hashlib.blake2b(" ".join(par.split()).encode(),
                              digest_size=8).digest()
        if key in _seen_par or len(par.strip()) < 40:
            continue
        _seen_par.add(key)
        out.append(par)
    return "\n\n".join(out)


_DESC_RE = re.compile(r'"(?:description|documentation)"\s*:\s*'
                      r'"((?:[^"\\]|\\.)*)"')


def walk_json_descriptions(roots):
    files = []
    for r in roots:
        files.extend(glob.glob(os.path.join(r, "**", "*.json"),
                               recursive=True))
    for f in sorted(files):
        try:
            s = open(f, encoding="utf-8", errors="ignore").read()
        except OSError:
            continue
        parts = []
        for m in _DESC_RE.finditer(s):
            try:
                parts.append(json.loads('"' + m.group(1) + '"'))
            except ValueError:
                continue
        if parts:
            yield _dedup_paragraphs("\n\n".join(parts))


def walk_docstrings(roots):
    files = []
    for r in roots:
        files.extend(glob.glob(os.path.join(r, "**", "*.py"),
                               recursive=True))
    for f in sorted(files):
        try:
            src = open(f, encoding="utf-8", errors="ignore").read()
            tree = ast.parse(src)
        except (OSError, SyntaxError, ValueError, MemoryError):
            continue
        parts = []
        for node in ast.walk(tree):
            if isinstance(node, (ast.Module, ast.ClassDef,
                                 ast.FunctionDef, ast.AsyncFunctionDef)):
                d = ast.get_docstring(node, clean=True)
                if d:
                    parts.append(d)
        if parts:
            yield _dedup_paragraphs("\n\n".join(parts))


def walk_docs(roots):
    files = []
    for r in roots:
        for ext in ("md", "rst", "txt"):
            files.extend(glob.glob(os.path.join(r, "**", "*." + ext),
                                   recursive=True))
    for f in sorted(files):
        try:
            if os.path.getsize(f) < 512:
                continue
            s = open(f, encoding="utf-8", errors="ignore").read()
        except OSError:
            continue
        yield _dedup_paragraphs(s)


def main():
    buf = io.BytesIO()
    sdk = "/usr/lib/google-cloud-sdk"
    venv = "/opt/venv/lib"
    stages = [
        ("json-descriptions", walk_json_descriptions([sdk, venv])),
        ("docstrings", walk_docstrings([sdk, venv, "/usr/lib/python3.12"])),
        ("docs", walk_docs([venv, sdk, "/usr/share/doc"])),
    ]
    for name, gen in stages:
        start = buf.tell()
        for chunk in gen:
            if chunk:
                buf.write(chunk.encode("utf-8", errors="ignore"))
                buf.write(b"\n\n")
            if buf.tell() >= TARGET:
                break
        print(f"{name}: +{(buf.tell() - start) >> 20} MiB "
              f"(total {buf.tell() >> 20} MiB)", flush=True)
        if buf.tell() >= TARGET:
            break
    data = buf.getvalue()[:TARGET]
    with open(OUT, "wb") as f:
        f.write(data)
    print(f"wrote {OUT}: {len(data)} bytes, "
          f"sha256 {hashlib.sha256(data).hexdigest()[:16]}")


if __name__ == "__main__":
    main()
