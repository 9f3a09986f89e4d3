"""URL block/allow filtering for web-corpus curation.

Every public web-text pipeline (CCNet, C4, RefinedWeb) starts by
dropping documents from listed domains/hosts/URL-prefixes (adult,
malware, boilerplate mirrors). Rules come as a table of
``(kind, pattern)`` rows:

- ``domain``: registered domain equals pattern (``example.org`` blocks
  every host under it);
- ``host``: host equals pattern OR is a subdomain of it
  (``bad.example.org`` also blocks ``cdn.bad.example.org``);
- ``prefix``: the canonical URL starts with the pattern
  (``https://example.org/ads/`` blocks one subtree).

The reference's closest analogue is the filter plugin stage
(embulk-core/src/main/java/org/embulk/spi/FilterPlugin.java:14-37);
this is a SURVEY §2.10 curation extension.

Scale shape: rule lists are thousands of rows — always broadcastable.
Every rule kind reduces to an equi-join on the URL's registered domain
(each pattern's own registered domain is precomputed on the rule side),
with the kind-specific residual as a join filter, executed as ONE
broadcast hash anti/semi join: the corpus is scanned once, never
shuffled, and a URL only compares against the handful of rules sharing
its domain — never the whole list (the naive ``LIKE ANY`` scan is
O(rows·rules) and is exactly what the domain-bucketed join avoids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textops import canonical_url, url_domain, url_host

RULE_KINDS = ("domain", "host", "prefix")


def _rule_join_keys(rules: DataFrame) -> DataFrame:
    """Add ``rule_domain`` — the registered domain of each pattern, the
    equi-join key. For ``prefix`` rules the pattern is a URL; for
    ``domain``/``host`` it is already a bare name (its last two labels
    are its registered domain)."""
    pat = F.col("pattern")
    bare_domain = F.regexp_extract(F.lower(pat), r"([^.]+\.[^.]+)$", 1)
    return rules.withColumn(
        "rule_domain",
        F.when(F.col("kind") == "prefix", url_domain(pat)).otherwise(bare_domain),
    )


def apply_url_rules(
    df: DataFrame,
    rules: DataFrame,
    *,
    url_col: str = "url",
    mode: str = "block",
) -> DataFrame:
    """Filter ``df`` by the rules table (columns ``kind``, ``pattern``).

    ``mode="block"`` keeps rows matching NO rule (anti join);
    ``mode="allow"`` keeps rows matching at least one (semi join).
    Matching is case-insensitive on host/domain (hosts are) and uses the
    canonical URL for prefix rules so ``http://X:80/p#f`` and
    ``http://x/p`` agree."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be block|allow, got {mode!r}")
    u = F.col(url_col)
    keyed = df.withColumns({
        "_host": url_host(u),
        "_domain": url_domain(u),
        "_canon": canonical_url(u),
    })
    r = _rule_join_keys(rules)
    cond = (F.col("_domain") == F.col("rule_domain")) & (
        ((F.col("kind") == "domain") & (F.col("_domain") == F.lower(F.col("pattern"))))
        | (
            (F.col("kind") == "host")
            & (
                (F.col("_host") == F.lower(F.col("pattern")))
                | F.col("_host").endswith(F.concat(F.lit("."), F.lower(F.col("pattern"))))
            )
        )
        | ((F.col("kind") == "prefix") & F.col("_canon").startswith(F.col("pattern")))
    )
    how = "left_anti" if mode == "block" else "left_semi"
    return keyed.join(F.broadcast(r), cond, how).drop("_host", "_domain", "_canon")
