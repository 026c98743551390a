"""Crawl-admission operators: robots.txt rules applied to URL sets.

A curation pipeline that re-crawls or attributes provenance needs the
same admission decision the crawler made: parse each site's robots.txt
into (agent, allow/disallow, path-prefix) rules, then admit each URL
by the LONGEST matching prefix, allow winning ties — the de-facto
standard evaluation order (RFC 9309 §2.2.2).

Scale shape: robots.txt is a per-DOMAIN dimension (model-sized next to
the URL fact table), so rules parse in one dimension-sized Arrow seam,
broadcast to the URL side, and the longest-match winner is a max_by
aggregate over the (bounded: rules-per-domain) match fan-out.  The URL
table itself never shuffles before the match join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)


def parse_robots(txt: str, agent: str = "*") -> list[tuple[bool, str]]:
    """Rules of the group(s) applying to `agent` (exact token match or
    the '*' group) as [(allow, path_prefix)].  Group semantics per RFC
    9309: consecutive user-agent lines open one group; the most
    specific matching group wins (exact agent beats '*'); empty
    disallow means allow-all and contributes no rule."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agents = True
    for raw in str(txt).splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agents = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agents = False
            if val:
                cur_rules.append((key == "allow", val))
        else:
            in_agents = False  # crawl-delay/sitemap close the agent run
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    agent = agent.lower()
    exact = [r for agents, rules in groups if agent in agents
             for r in rules]
    if any(agent in agents for agents, _ in groups):
        return exact
    return [r for agents, rules in groups if "*" in agents for r in rules]


ROBOTS_RULES_SCHEMA = "domain string, allow boolean, path_prefix string"


def robots_rules(
    robots: DataFrame,
    domain_col: str = "domain",
    txt_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(domain, robots_txt) dimension -> one row per rule.  Runs in a
    dimension-sized Arrow seam; the output is what robots_admit
    broadcasts."""

    def run(batches):
        for pdf in batches:
            doms, allows, prefixes = [], [], []
            for dom, txt in zip(pdf[domain_col], pdf[txt_col]):
                for allow, prefix in parse_robots(txt, agent):
                    doms.append(dom)
                    allows.append(allow)
                    prefixes.append(prefix)
            yield pd.DataFrame(
                {
                    "domain": pd.Series(doms, dtype=object),
                    "allow": pd.Series(allows, dtype=bool),
                    "path_prefix": pd.Series(prefixes, dtype=object),
                }
            )

    return robots.select(domain_col, txt_col).mapInPandas(
        run, ROBOTS_RULES_SCHEMA
    )


def robots_admit(
    urls: DataFrame,
    rules: DataFrame,
    url_id_col: str = "url_id",
    domain_col: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """Admission per URL: longest matching path-prefix rule wins,
    allow beats disallow on equal length, no matching rule admits
    (RFC 9309 evaluation order).  rules (from robots_rules) broadcast;
    the winner is max_by over the per-URL match fan-out.  Non-matching
    fan-out rows are kept with a NULL rank (max_by skips them) instead
    of being filtered and joined back, so the URL columns ride through
    the aggregate via any_value and the WHOLE operator costs exactly
    one fact-table shuffle (the url_id hash aggregate) — no second
    join back to the URL table."""
    joined = urls.join(
        F.broadcast(rules), on=urls[domain_col] == rules["domain"],
        how="left",
    )
    is_match = F.col("path_prefix").isNotNull() & F.col(
        path_col
    ).startswith(F.col("path_prefix"))
    # rank = (prefix length, allow) so ties resolve allow-first;
    # non-matching rows rank NULL and are invisible to max_by
    rank = F.when(
        is_match,
        F.struct(
            F.length("path_prefix").alias("plen"),
            F.col("allow").cast("int").alias("allow_i"),
        ),
    )
    carried = [c for c in urls.columns if c != url_id_col]
    agg = joined.groupBy(urls[url_id_col].alias(url_id_col)).agg(
        *[F.any_value(urls[c]).alias(c) for c in carried],
        F.max_by(F.when(is_match, F.col("allow")), rank).alias(
            "_best_allow"
        ),
        F.count(F.when(is_match, F.lit(1))).alias("_n_matches"),
    )
    return agg.select(
        *[F.col(c) for c in urls.columns],
        F.coalesce(F.col("_best_allow"), F.lit(True)).alias("admitted"),
        F.col("_n_matches").alias("n_rules_matched"),
    )
