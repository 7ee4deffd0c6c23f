"""Frozen byte-identity goldens (FIXTURES.md §5).

md5 of the full conversion output for the reference's own HTML fixtures,
frozen from the validated oracle. Any semantic drift in the parser /
converter / serializers breaks these — THE byte-identity regression gate.
"""

import hashlib

from markdown_lab_spark.oracle import chunk_markdown, convert_html

GOLDENS = {
    ("medium.html", "markdown"): "a7aa77cbb24b72c85f16a84211b1a6a1",
    ("medium.html", "json"): "4cbf40efd0c3f0a131065d0e24771591",
    ("medium.html", "xml"): "fe5fba539415121ee561d5cb6938a187",
    # large.html re-frozen in round 2: the {user.avatar} img src now
    # percent-encodes to %7Buser.avatar%7D per the WHATWG path
    # percent-encode set ('{'/'}' included), which is what rust-url's
    # Url::join + to_string emits — the round-1 value was a latent
    # divergence from the reference
    ("large.html", "markdown"): "c889f557ecffc40bec0022e5a1de681e",
    ("large.html", "json"): "cdc396277b6cb097425a512a244701c7",
    ("large.html", "xml"): "a3402d910a5af39865cb9c477f29ff91",
}

# chunker goldens over sample.md at the reference bench configs
# (benches/markdown_bench.rs:58-59, tests/unit/test_chunk_utils.py:59)
CHUNK_GOLDENS = {
    # 1000/200 and 500/50 produce identical chunks on sample.md: its
    # sections are all < 500 B, so only heading flushes occur
    (1000, 200): "6a02c05379569435cdd2f64742051ea0",
    (500, 50): "6a02c05379569435cdd2f64742051ea0",
    (100, 20): "9de6cacf15077ca41fdddc7e164ac837",
}


def test_conversion_goldens():
    for (name, fmt), want in GOLDENS.items():
        html = open(f"/root/reference/test_data/{name}").read()
        out = convert_html(html, f"https://example.com/docs/{name}", fmt)
        got = hashlib.md5(out.encode()).hexdigest()
        assert got == want, f"{name}/{fmt}: {got} != {want}"


def test_chunker_goldens():
    md = open("/root/reference/test_data/sample.md").read()
    for (size, overlap), want in CHUNK_GOLDENS.items():
        chunks = chunk_markdown(md, size, overlap)
        got = hashlib.md5("\x00".join(chunks).encode()).hexdigest()
        assert got == want, f"chunk({size},{overlap}): {got} != {want}"
