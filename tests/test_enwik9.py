"""enwik9-preproc tool: reorder + WIT transform round-trip tests."""

import subprocess
import sys

from cmix_tpu.preprocess import enwik9


def _mini_wiki(n=12, redirects=(3, 7)):
    intro = b"<mediawiki>\n  <siteinfo>\n    <sitename>Wp</sitename>\n" \
            b"  </siteinfo>\n"
    pages = []
    ts = 1050000000
    for i in range(n):
        ts += 9973 * (i + 1)
        import time as _t
        stamp = _t.strftime("%Y-%m-%dT%H:%M:%S", _t.gmtime(ts))
        if i in redirects:
            body = (b"      <text xml:space=\"preserve\">#REDIRECT [[X]]"
                    b"</text>\n")
        else:
            body = (b"      <text xml:space=\"preserve\">Article body %d "
                    b"with some [[links]] and text.</text>\n" % i)
        pages.append(
            b"  <page>\n    <title>Page %d</title>\n    <id>%d</id>\n"
            b"    <revision>\n      <id>%d</id>\n"
            b"      <timestamp>%sZ</timestamp>\n%s    </revision>\n"
            b"  </page>\n" % (i, 100 + i * 3, 9000 + i * 7,
                              stamp.encode(), body))
    coda = b"</mediawiki>\n"
    return intro + b"".join(pages) + coda


def test_roundtrip_no_order():
    data = _mini_wiki()
    assert enwik9.decode(enwik9.encode(data)) == data


def test_roundtrip_with_reorder():
    data = _mini_wiki()
    order = [5, 0, 9, 2, 1, 3]   # semantic order over non-redirects
    blob = enwik9.encode(data, order)
    assert enwik9.decode(blob) == data
    # the permutation actually happened
    assert blob != enwik9.encode(data)


def test_numerics_leave_text_stream():
    data = _mini_wiki()
    blob = enwik9.encode(data)
    # id digits and timestamps are moved out of the page texts
    assert b"<id>100</id>" not in blob
    assert b"<timestamp>2" not in blob
    assert enwik9.decode(blob) == data


def test_arbitrary_input_roundtrips():
    for data in (b"", b"no pages here at all", b"  <page>\nunterminated",
                 _mini_wiki()[:-3], b"\x00\xff" * 100):
        assert enwik9.decode(enwik9.encode(data)) == data


def test_remap_skips_redirects():
    data = _mini_wiki(n=6, redirects=(1, 4))
    order = enwik9.make_remap_order(data)
    assert order == [0, 2, 3, 5]


def test_semantic_order():
    """The derived ordering clusters same-category articles adjacently
    and round-trips through encode/decode (the role of the reference's
    new_article_order asset, generated instead of vendored)."""
    intro = b"<mediawiki>\n"
    cats = [b"Birds", b"Physics", b"Birds", b"Physics", b"Birds"]
    pages = []
    for i, c in enumerate(cats):
        pages.append(
            b"  <page>\n    <title>Topic %d</title>\n    <id>%d</id>\n"
            b"      <text xml:space=\"preserve\">Body [[Category:%s]]"
            b"</text>\n  </page>\n" % (i, 10 + i, c))
    data = intro + b"".join(pages) + b"</mediawiki>\n"
    order = enwik9.make_semantic_order(data)
    assert sorted(order) == list(range(5))
    cat_seq = [cats[i] for i in order]
    assert cat_seq == sorted(cat_seq)       # clustered by category
    blob = enwik9.encode(data, order)
    assert enwik9.decode(blob) == data


def test_cli(tmp_path):
    data = _mini_wiki()
    src = tmp_path / "wiki.xml"
    src.write_bytes(data)
    enc = tmp_path / "wiki.w9"
    dec = tmp_path / "wiki.out"
    orderf = tmp_path / "order"
    subprocess.run([sys.executable, "-m", "cmix_tpu.preprocess.enwik9",
                    "remap", str(src), str(orderf)], check=True)
    subprocess.run([sys.executable, "-m", "cmix_tpu.preprocess.enwik9",
                    "c", str(src), str(enc), "--order", str(orderf)],
                   check=True)
    subprocess.run([sys.executable, "-m", "cmix_tpu.preprocess.enwik9",
                    "d", str(enc), str(dec)], check=True)
    assert dec.read_bytes() == data
