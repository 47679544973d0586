"""Build the non-repeated 4 MiB bench corpus (testdata/bench4m.raw).

The round-1 bench corpus repeated 300 KB of testdata ~13x, which let the
cross-block match models memorize it and made the bench bpb meaningless
as a ratio claim (VERDICT.md Weak #1).  This corpus concatenates
*distinct* real data once each -- no content repeats:

  * the three 100 KB probes (GPL text, word list, ELF fragment)
  * distinct Python/JSON/C sources from the installed site-packages
    (each file used at most once, deduped by content hash)
  * a contiguous ELF .so slice (binary/exe-like)
  * a slice of the perl Unicode collation table (structured text)

The output is committed to the repo so the bench is stable across
machines; this script only documents/regenerates it.
"""

import hashlib
import os

TARGET = 4 << 20
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "testdata", "bench4m.raw")


def gather_sources(root, exts, cap, skip_prefix=()):
    """Concatenate distinct files under root (sorted walk, deduped)."""
    parts, seen, total = [], set(), 0
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        if any(dirpath.startswith(p) for p in skip_prefix):
            continue
        for fn in sorted(filenames):
            if not fn.endswith(exts):
                continue
            try:
                blob = open(os.path.join(dirpath, fn), "rb").read()
            except OSError:
                continue
            if not (512 <= len(blob) <= 200_000):
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
    td = os.path.dirname(OUT)
    parts = []
    for name in ("text100k.raw", "dict100k.raw", "exe100k.raw"):
        parts.append(open(os.path.join(td, name), "rb").read())

    sp = "/opt/venv/lib/python3.12/site-packages"
    parts.append(gather_sources(
        os.path.join(sp, "numpy"), (".py",), 1 << 20))
    parts.append(gather_sources(
        os.path.join(sp, "jax"), (".py",), 600_000))

    # one contiguous ELF slice (exe/binary modality, not repeated)
    import numpy  # located via the installed package
    so_dir = os.path.join(sp, "numpy", "_core")
    so = sorted(f for f in os.listdir(so_dir) if f.endswith(".so"))[0]
    parts.append(open(os.path.join(so_dir, so), "rb").read()[:800_000])

    allkeys = "/usr/share/perl/5.36.0/Unicode/Collate/allkeys.txt"
    if os.path.exists(allkeys):
        parts.append(open(allkeys, "rb").read()[:700_000])

    # JSON/metadata text to fill the remainder
    parts.append(gather_sources(sp, (".json", ".txt", ".h"), 1 << 20))
    parts.append(gather_sources(
        os.path.join(sp, "scipy"), (".py",), 1 << 20))

    blob = b"".join(parts)[:TARGET]
    assert len(blob) == TARGET, f"only {len(blob)} bytes gathered"
    with open(OUT, "wb") as f:
        f.write(blob)
    print(f"wrote {OUT}: {len(blob)} bytes")


if __name__ == "__main__":
    main()
