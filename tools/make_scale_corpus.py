"""Build the 50 MiB scale-run corpus (work/scale50m.raw, NOT committed).

VERDICT.md round-1 item 4 asks for an enwik8-class scale run (>= 50 MB
of Wikipedia text through dictionary + segmentation + preprocessing).
enwik8 itself is not present on this machine and cannot be fetched
(zero-egress environment), so this builds the largest feasible real
corpus from local data, heavily weighted toward English prose the way
enwik8 is:

  * English documentation prose (/usr/share/doc changelogs/READMEs,
    gzip-decompressed, plus .rst/.md/.txt from site-packages) -- ~70%
  * distinct source code (Python/C headers, system + site-packages)
    fills what prose cannot (~20 MB of real prose exists locally)
  * binary (ELF shared objects) -- the last ~10%

Every file is used at most once (content-hash dedup); nothing repeats,
so cross-block match models cannot memorize the corpus and the measured
bpb is a real ratio claim (the VERDICT Weak-1 rule).
"""

import gzip
import hashlib
import os
import sys

TARGET = 50 << 20
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "work", "scale50m.raw")


def gather(roots, want, cap, decompress_gz=False):
    parts, seen, total = [], set(), 0
    for root in roots:
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                p = os.path.join(dirpath, fn)
                try:
                    if decompress_gz and fn.endswith(".gz"):
                        blob = gzip.open(p).read()
                    elif want(fn):
                        blob = open(p, "rb").read()
                    else:
                        continue
                except OSError:
                    continue
                if not (512 <= len(blob) <= 4_000_000):
                    continue
                h = hashlib.sha256(blob).digest()
                if h in seen:
                    continue
                seen.add(h)
                parts.append(blob)
                total += len(blob)
                if total >= cap:
                    return b"".join(parts)[:cap]
    return b"".join(parts)[:cap]


def main():
    text = gather(
        ["/usr/share/doc"],
        lambda f: f.endswith((".txt", ".md", "README", "copyright")),
        TARGET * 70 // 100, decompress_gz=True)
    prose2 = gather(
        ["/opt/venv/lib/python3.12/site-packages"],
        lambda f: f.endswith((".rst", ".md", ".txt")),
        TARGET * 70 // 100 - len(text))
    src = gather(
        ["/usr/lib/python3.11", "/usr/include",
         "/opt/venv/lib/python3.12/site-packages"],
        lambda f: f.endswith((".py", ".h")),
        TARGET * 90 // 100 - len(text) - len(prose2))
    binsz = TARGET - len(text) - len(prose2) - len(src)
    bins = gather(
        ["/usr/lib/x86_64-linux-gnu"],
        lambda f: ".so" in f, binsz)
    blob = (text + prose2 + src + bins)[:TARGET]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "wb") as f:
        f.write(blob)
    print(f"{OUT}: {len(blob)} bytes "
          f"(text {len(text) + len(prose2)}, src {len(src)}, "
          f"bin {len(bins)})")
    if len(blob) < TARGET:
        print("WARNING: short of target", TARGET - len(blob),
              file=sys.stderr)


if __name__ == "__main__":
    main()
