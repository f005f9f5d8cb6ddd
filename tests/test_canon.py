"""E1/E2 — URL validity + canonicalization (reference src/api.ts:192-200,
crawlee uniqueKey normalization surfaced at src/crawler.ts:50-51,104)."""

from hypothesis import given, strategies as st

from webscraper_ray.oracle.canon import canonicalize, host_of, is_valid_url


def test_valid_url_requires_https_prefix():
    assert is_valid_url("https://example.com/a")
    assert not is_valid_url("http://example.com/a")
    assert not is_valid_url("HTTPS://example.com/a")  # case-sensitive startsWith
    assert not is_valid_url("ftp://example.com")
    assert not is_valid_url(None)
    assert not is_valid_url(42)
    assert not is_valid_url("https://")  # no host -> new URL() throws


def test_canonicalize_lowercases_scheme_and_host_only():
    assert canonicalize("https://ExAmPle.COM/Path/File") == "https://example.com/Path/File"


def test_canonicalize_strips_fragment_and_default_port():
    assert canonicalize("https://example.com:443/a#frag") == "https://example.com/a"
    assert canonicalize("https://example.com:8443/a") == "https://example.com:8443/a"


def test_canonicalize_drops_utm_and_sorts_params():
    url = "https://example.com/p?b=2&utm_source=x&a=1&UTM_campaign=y"
    assert canonicalize(url) == "https://example.com/p?a=1&b=2"


def test_canonicalize_empty_path_and_trim():
    assert canonicalize("  https://example.com  ") == "https://example.com/"


def test_variants_collapse_to_same_key():
    variants = [
        "https://Example.com/a?x=1&y=2",
        "https://example.com/a?y=2&x=1#sec",
        "https://example.com:443/a?utm_medium=m&y=2&x=1",
    ]
    keys = {canonicalize(v) for v in variants}
    assert keys == {"https://example.com/a?x=1&y=2"}


def test_host_of():
    assert host_of("https://sub.example.com/a") == "sub.example.com"


@given(st.text(alphabet="abcdefghij.-/?=&_%#:0123456789", max_size=60))
def test_canonicalize_idempotent(suffix):
    url = "https://example.com/" + suffix
    if not is_valid_url(url):
        return
    try:
        once = canonicalize(url)
    except ValueError:
        return
    assert canonicalize(once) == once
