"""Regenerate the shipped dictionary asset (cmix_tpu/data/english.dic).

Head: the hand-curated common-English core (cmix_tpu/tools/core_words.py)
so 1-byte/early-2-byte WRT codewords go to genuinely common words.
Tail: frequency-ranked words from the prose-leaning local corpora
(package docs: .rst/.md/.txt/METADATA), filtered to words seen in >= 2
distinct documents so file-local identifiers stay out (ADVICE.md r2).

Deterministic: sorted walk, content-hash dedupe, alphabetical tie-break.
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cmix_tpu.tools.make_dict import build_dictionary

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "cmix_tpu", "data", "english.dic")
SP = "/opt/venv/lib/python3.12/site-packages"


def corpus_paths():
    paths = []
    for root, ds, fs in sorted(os.walk(SP)):
        ds.sort()
        for f in sorted(fs):
            if f.lower().endswith((".rst", ".md", ".txt")) \
                    or f == "METADATA":
                p = os.path.join(root, f)
                try:
                    if 200 < os.path.getsize(p) < 300000:
                        paths.append(p)
                except OSError:
                    pass
    paths.append("/root/reference/COPYING")
    return paths


def blobs():
    seen = set()
    for p in corpus_paths():
        b = open(p, "rb").read()
        h = hashlib.sha256(b).digest()
        if h in seen:
            continue
        seen.add(h)
        yield b


def main():
    words = build_dictionary(blobs(), max_words=30000, min_count=2,
                             min_docs=2)
    with open(OUT, "wb") as f:
        f.write(("\n".join(words) + "\n").encode())
    print(f"{OUT}: {len(words)} words; head: {words[:10]}")


if __name__ == "__main__":
    main()
