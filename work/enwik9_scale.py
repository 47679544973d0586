"""Prove the enwik9-preproc tool at 1 GB scale (VERDICT r3 item 8).

No enwik9 exists in this zero-egress environment, so the dump is
synthesized: 1 GB of mediawiki-shaped pages whose bodies are real text
drawn from local corpora (site-packages docs), with ids, timestamps,
categories and redirects -- the structural features the transform
manipulates.  Runs encode (--order auto) + decode and byte-compares.
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")

TARGET = 1 << 30
DUMP = "/root/repo/work/wiki1g.xml"


def build_dump():
    if os.path.exists(DUMP) and os.path.getsize(DUMP) >= TARGET:
        return
    sp = "/opt/venv/lib/python3.12/site-packages"
    texts = []
    seen = set()
    for root, ds, fs in sorted(os.walk(sp)):
        ds.sort()
        for f in sorted(fs):
            if f.lower().endswith((".rst", ".md", ".txt", ".py")):
                p = os.path.join(root, f)
                try:
                    b = open(p, "rb").read()
                except OSError:
                    continue
                if not (1000 < len(b) < 100000):
                    continue
                h = hashlib.sha256(b).digest()
                if h in seen:
                    continue
                seen.add(h)
                texts.append(b.replace(b"</", b"< /"))
    print(f"{len(texts)} body sources", flush=True)
    cats = [b"Software", b"Mathematics", b"History", b"Science",
            b"Geography", b"Music", b"Biology", b"Art"]
    ts = 1040000000
    out = open(DUMP, "wb")
    out.write(b"<mediawiki>\n  <siteinfo>\n    <sitename>Syn</sitename>"
              b"\n  </siteinfo>\n")
    total = 60
    i = 0
    while total < TARGET:
        body = texts[i % len(texts)]
        ts += 7919
        import time as _t
        stamp = _t.strftime("%Y-%m-%dT%H:%M:%S", _t.gmtime(ts)).encode()
        if i % 23 == 5:
            text = b"      <text xml:space=\"preserve\">#REDIRECT " \
                b"[[Other]]</text>\n"
        else:
            text = (b"      <text xml:space=\"preserve\">" + body
                    + b" [[Category:" + cats[(i * 7) % len(cats)]
                    + b"]]</text>\n")
        page = (b"  <page>\n    <title>Article %d about %d</title>\n"
                b"    <id>%d</id>\n    <revision>\n      <id>%d</id>\n"
                b"      <timestamp>%sZ</timestamp>\n%s    </revision>\n"
                b"  </page>\n"
                % (i, i % 997, 50 + i * 2, 12345 + i * 11, stamp, text))
        out.write(page)
        total += len(page)
        i += 1
    out.write(b"</mediawiki>\n")
    out.close()
    print(f"dump {os.path.getsize(DUMP)} bytes, {i} pages", flush=True)


def main():
    build_dump()
    from cmix_tpu.preprocess import enwik9
    data = open(DUMP, "rb").read()
    t0 = time.time()
    order = enwik9.make_semantic_order(data)
    print(f"order: {len(order)} articles in {time.time()-t0:.0f}s",
          flush=True)
    t0 = time.time()
    blob = enwik9.encode(data, order)
    print(f"encode: {len(data)} -> {len(blob)} in {time.time()-t0:.0f}s",
          flush=True)
    t0 = time.time()
    back = enwik9.decode(blob)
    print(f"decode: {time.time()-t0:.0f}s  roundtrip={back == data}",
          flush=True)


main()
