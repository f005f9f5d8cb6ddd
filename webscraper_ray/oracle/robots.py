"""robots.txt parsing (north_rule: per-host robots cache).

The reference is a single-URL service and does no robots handling; the
north rule adds a per-host robots cache to the frontier. The FRONTIER
side (rule enforcement, host-sharded storage, crawl-delay -> politeness
budget) lives in ``state/frontier_core.py``; this module supplies the
missing first step — parsing raw ``robots.txt`` bytes into the
``(disallow_prefixes, crawl_delay_ms)`` rules the shards consume —
implemented against the public REP spec (RFC 9309) subset:

- groups of ``User-agent:`` lines followed by rules; a group with
  multiple consecutive user-agent lines applies to all of them
- group selection: longest user-agent token that prefix-matches ours
  (case-insensitive), else the ``*`` group, else no rules
- ``Disallow:`` path prefixes (empty value = allow all, per spec);
  ``Allow:`` lines are accepted but ignored by the prefix-filter model
  (documented engine simplification — the frontier filter is
  prefix-deny only)
- ``Crawl-delay:`` seconds (non-standard but ubiquitous) -> ms
- comments (#), blank lines, unknown directives tolerated
"""

from __future__ import annotations

__all__ = ["parse_robots_txt", "rules_from_texts"]


def parse_robots_txt(
    text: str, user_agent: str = "webscraper-ray"
) -> tuple[list[str], int]:
    """-> (disallow_prefixes, crawl_delay_ms) for the best-matching group."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[str], float | None]] = []
    agents: list[str] = []
    disallows: list[str] = []
    delay: float | None = None
    in_rules = False

    def flush() -> None:
        nonlocal agents, disallows, delay, in_rules
        if agents:
            groups.append((agents, disallows, delay))
        agents, disallows, delay = [], [], None
        in_rules = False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:
                flush()
            agents.append(value.lower())
        elif field in ("disallow", "allow", "crawl-delay"):
            in_rules = True
            if field == "disallow" and value:
                disallows.append(value)
            elif field == "crawl-delay":
                try:
                    delay = float(value)
                except ValueError:
                    pass
    flush()

    best: tuple[list[str], float | None] | None = None
    best_len = -1
    for group_agents, group_dis, group_delay in groups:
        for agent in group_agents:
            if agent == "*":
                match_len = 0
            elif ua.startswith(agent):
                match_len = len(agent)
            else:
                continue
            if match_len > best_len:
                best_len = match_len
                best = (group_dis, group_delay)
    if best is None:
        return [], 0
    dis, d = best
    return list(dis), int(round((d or 0.0) * 1000))


def rules_from_texts(
    robots_texts: dict[str, str], user_agent: str = "webscraper-ray"
) -> dict[str, tuple[list[str], int]]:
    """host -> rules, the exact structure ``ShardedFrontier`` shards by
    host (a missing/empty robots.txt means no restrictions)."""
    return {
        host: parse_robots_txt(text or "", user_agent)
        for host, text in robots_texts.items()
    }
