"""robots.txt parsing and URL permission matching (RFC 9309 subset) —
the crawl-politeness gate every web corpus pipeline applies before (or
retroactively to) its URL universe.

The reference has no crawl surface (its closest shape is a per-record
filter chain, reference spi/FilterPlugin.java:15-35); this implements
the two halves as DataFrame plans:

- :func:`parse_robots`: robots.txt TEXT → a rules table. RFC 9309 group
  semantics: consecutive ``User-agent`` lines form a header whose
  following ``Allow``/``Disallow`` lines apply to ALL named agents; a
  ``User-agent`` after rules starts a new group; comments (``#`` to
  end-of-line) stripped; directive names case-insensitive; empty rule
  paths match nothing and are dropped.
- :func:`robots_match`: URLs × rules → allow/deny per URL. Per host,
  groups naming the requested agent exactly (case-insensitive) take
  precedence — ``*`` groups are consulted only when no specific group
  exists (RFC 9309 §2.2.1). Among matching rules the LONGEST path
  prefix wins; on a length tie ``Allow`` wins (least-restrictive). No
  matching rule (or no robots.txt for the host) defaults to allowed.

Subset notes (documented, deterministic): ``*``/``$`` wildcards inside
rule paths and percent-encoding normalization are not implemented —
paths match as literal prefixes; agent names match as whole tokens, not
product-token prefixes.

Scale shape: the robots corpus is O(hosts) — orders of magnitude
smaller than the URL universe — so parsing shuffles only (host, group)
frames and the match side BROADCASTS the rules: the URL frame never
shuffles on host, and the only wide exchange is the per-url winner
aggregation (max_by, partial-combine, no window sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, agent, path, allow) rules from raw robots.txt bodies.

    One posexplode over lines; group ids via a running sum of
    block-start markers (a ``User-agent`` line whose predecessor is not
    one) over the (host, line-order) window; rules then equi-join back
    to their group's agent header. All string work is JVM Columns."""
    from pyspark.sql.window import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")),
                                     "\r", ""), "\n")
        ).alias("pos", "raw"),
    ).select(
        "host", "pos",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")
    parsed = lines.select(
        "host", "pos",
        F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1))).alias("kind"),
        F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1)).alias("value"),
    ).filter(F.col("kind").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("pos")
    grouped = parsed.withColumn(
        "starts_block",
        (
            (F.col("kind") == "user-agent")
            & (F.coalesce(F.lag("kind").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn(
        "group_id",
        F.sum("starts_block").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    agents = grouped.filter(F.col("kind") == "user-agent").select(
        "host", "group_id", F.lower(F.col("value")).alias("agent")
    ).distinct()
    rules = grouped.filter(
        (F.col("kind") != "user-agent") & (F.col("value") != "")
    ).select(
        "host", "group_id",
        F.col("value").alias("path"),
        (F.col("kind") == "allow").alias("allow"),
    )
    return agents.join(rules, ["host", "group_id"]).select(
        "host", "agent", "path", "allow"
    )


def robots_match(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Per-URL crawl permission under a rules table (RFC 9309 matching,
    see module docstring). Adds ``allowed`` and ``matched_path`` to the
    input frame (matched_path NULL when the default applied)."""
    agent = agent.lower()
    # specific-agent groups shadow '*' groups PER HOST: keep a host's
    # specific rules when it has any, its '*' rules otherwise
    per_host = rules.filter(F.col("agent").isin(agent, "*")).withColumn(
        "is_specific", (F.col("agent") == agent).cast("int")
    )
    hosts = per_host.groupBy("host").agg(
        F.max("is_specific").alias("has_specific")
    )
    chosen = per_host.join(hosts, "host").filter(
        F.col("is_specific") == F.col("has_specific")
    ).select("host", "path", "allow")

    host = F.lower(F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))
    upath = F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    u = urls.withColumn("_host", host).withColumn(
        "_path", F.when(upath == "", F.lit("/")).otherwise(upath)
    )
    cand = u.join(
        F.broadcast(chosen), u["_host"] == chosen["host"], "left"
    ).withColumn(
        "_hit", F.col("path").isNotNull() & F.col("_path").startswith(F.col("path"))
    )
    agg = cand.groupBy(url_col).agg(
        F.max_by(
            F.struct("allow", "path"),
            # (longest, allow-wins, lexicographically-greatest path) —
            # the last key only pins determinism on exact ties; non-hit
            # rows order NULL, which max_by ignores
            F.when(F.col("_hit"),
                   F.struct(F.length("path").alias("l"),
                            F.col("allow").cast("int").alias("a"),
                            F.col("path").alias("p"))),
        ).alias("win"),
        F.max(F.col("_hit").cast("int")).alias("any_hit"),
    )
    return agg.select(
        url_col,
        F.when(F.col("any_hit") == 1, F.col("win.allow"))
         .otherwise(F.lit(True)).alias("allowed"),
        F.when(F.col("any_hit") == 1, F.col("win.path")).alias("matched_path"),
    )


def robots_oracle_sql(
    urls_sql: str,
    robots_sql: str,
    agent: str = "*",
) -> str:
    """DuckDB mirror of parse_robots + robots_match over two inline
    relations: ``urls_sql`` must yield (url), ``robots_sql`` (host,
    robots_txt). Same group/window construction, same longest-prefix /
    allow-on-tie / specific-shadows-star resolution."""
    agent = agent.lower()
    return f"""
WITH raw_lines AS (
  SELECT host, i AS pos,
         trim(regexp_replace(ls[i], '#.*$', '')) AS line
  FROM (
    SELECT host,
           string_split(replace(coalesce(robots_txt, ''), chr(13), ''),
                        chr(10)) AS ls
    FROM ({robots_sql})
  ), unnest(range(1, len(ls) + 1)) AS t(i)
  WHERE trim(regexp_replace(ls[i], '#.*$', '')) <> ''
),
parsed AS (
  SELECT host, pos,
         lower(trim(regexp_extract(line, '^([^:]+):', 1))) AS kind,
         trim(regexp_extract(line, '^[^:]+:(.*)$', 1)) AS value
  FROM raw_lines
  WHERE lower(trim(regexp_extract(line, '^([^:]+):', 1)))
        IN ('user-agent', 'allow', 'disallow')
),
grouped AS (
  SELECT *, sum(starts_block) OVER (
           PARTITION BY host ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS group_id
  FROM (
    SELECT *, CASE WHEN kind = 'user-agent' AND
                   coalesce(lag(kind) OVER (PARTITION BY host ORDER BY pos),
                            '') <> 'user-agent'
              THEN 1 ELSE 0 END AS starts_block
    FROM parsed
  )
),
agents AS (
  SELECT DISTINCT host, group_id, lower(value) AS agent
  FROM grouped WHERE kind = 'user-agent'
),
rules AS (
  SELECT host, group_id, value AS path, kind = 'allow' AS allow
  FROM grouped WHERE kind <> 'user-agent' AND value <> ''
),
flat AS (
  SELECT a.host, a.agent, r.path, r.allow
  FROM agents a JOIN rules r USING (host, group_id)
),
per_host AS (
  SELECT *, (agent = '{agent}')::INT AS is_specific
  FROM flat WHERE agent IN ('{agent}', '*')
),
chosen AS (
  SELECT host, path, allow FROM (
    SELECT *, max(is_specific) OVER (PARTITION BY host) AS has_specific
    FROM per_host
  ) WHERE is_specific = has_specific
),
u AS (
  SELECT url,
         lower(regexp_extract(url,
           '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS _host,
         CASE WHEN regexp_extract(url,
                '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) = ''
              THEN '/'
              ELSE regexp_extract(url,
                '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1)
         END AS _path
  FROM ({urls_sql})
),
cand AS (
  SELECT u.url, u._path, c.path, c.allow,
         (c.path IS NOT NULL AND starts_with(u._path, c.path)) AS _hit
  FROM u LEFT JOIN chosen c ON u._host = c.host
),
ranked AS (
  SELECT url, path, allow, _hit,
         row_number() OVER (
           PARTITION BY url
           ORDER BY _hit DESC, length(path) DESC NULLS LAST,
                    allow DESC NULLS LAST, path DESC NULLS LAST) AS rn,
         max(_hit::INT) OVER (PARTITION BY url) AS any_hit
  FROM cand
)
SELECT url,
       CASE WHEN any_hit = 1 THEN allow ELSE TRUE END AS allowed,
       CASE WHEN any_hit = 1 THEN path END AS matched_path
FROM ranked WHERE rn = 1
"""
