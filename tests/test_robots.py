"""robots.txt parsing (RFC 9309 subset) -> frontier rules."""

from webscraper_ray.oracle.robots import parse_robots_txt, rules_from_texts

SAMPLE = """
# comments everywhere
User-agent: googlebot
Disallow: /google-only/

User-agent: webscraper-ray
User-agent: otherbot
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 1.5

User-agent: *
Disallow: /all-denied/
Crawl-delay: 10
"""


def test_specific_group_wins():
    dis, delay = parse_robots_txt(SAMPLE, user_agent="webscraper-ray/2.0")
    assert dis == ["/private/", "/tmp/"]
    assert delay == 1500


def test_star_group_fallback():
    dis, delay = parse_robots_txt(SAMPLE, user_agent="unknown-bot")
    assert dis == ["/all-denied/"]
    assert delay == 10_000


def test_empty_disallow_allows_all():
    dis, delay = parse_robots_txt("User-agent: *\nDisallow:\n")
    assert dis == [] and delay == 0


def test_no_matching_group_means_unrestricted():
    dis, delay = parse_robots_txt("User-agent: googlebot\nDisallow: /x/\n")
    assert dis == [] and delay == 0


def test_multiple_ua_lines_share_rules_and_repeat_groups():
    text = "User-agent: a\nDisallow: /1/\nUser-agent: b\nDisallow: /2/\n"
    assert parse_robots_txt(text, "a")[0] == ["/1/"]
    assert parse_robots_txt(text, "b")[0] == ["/2/"]


def test_rules_from_texts_feeds_frontier():
    from webscraper_ray.state.frontier_core import FrontierCore, PolitenessConfig

    rules = rules_from_texts({"h.x": "User-agent: *\nDisallow: /private/\n"})
    fc = FrontierCore(robots=rules, cfg=PolitenessConfig())
    assert fc.offer("https://h.x/private/page") == "robots"
    assert fc.offer("https://h.x/public") == "queued"
