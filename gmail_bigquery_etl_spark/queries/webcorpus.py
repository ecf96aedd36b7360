"""Web-corpus preparation queries: the two pipeline stages a
web-crawl-to-training-corpus pipeline runs BEFORE the quality/dedup
families already covered — raw-markup main-content extraction and
corpus-level paragraph deduplication.

  curation_html_extract -- jusText/trafilatura-style main-content
                           extraction from HTML pages (Pomikalek 2011;
                           the WARC->text stage of C4/RefinedWeb): strip
                           script/style, split the page into tag-delimited
                           blocks, classify each block by LINK DENSITY and
                           TOKEN COUNT, keep content blocks, reassemble
                           the article text in document order. The fixture
                           has no HTML, so each document is wrapped into a
                           deterministic page ON BOTH SIDES (the
                           text_pii_redaction precedent) with real
                           boilerplate organs (nav with links, an ads div,
                           a short footer): the operator under test is the
                           extraction pipeline, not the fixture.
  curation_line_dedup   -- CCNet-style corpus-level paragraph dedup
                           (Wenzek et al. 2020 sec. 3.1, the LLaMA-1
                           pipeline's first dedup pass): hash-group every
                           paragraph across the corpus, keep only the
                           FIRST occurrence (min (doc_id, pos)), rewrite
                           each document from its surviving paragraphs.
                           Operates on the augmented corpus (exact + near
                           copies) plus two md5-planted boilerplate
                           paragraphs, so exact copies dedup to empty,
                           near copies keep only their divergent tail, and
                           the boilerplate mass dedups corpus-wide to its
                           two first occurrences.

  webcorpus_link_rank   -- hyperlink-graph selection (WebText-style,
                           Radford et al. 2019): anchor targets
                           EXTRACTED from the planted markup become the
                           link graph; integer fixed-point PageRank
                           (pagerank_units) ranks documents by link
                           centrality, one lazy plan from page bytes to
                           scores.

Scale posture (100 TB): extraction stages are one corpus scan +
constant-fan-out explode. html-extract is scan-bound (regex battery + one per-doc
re-aggregation; zero joins). line-dedup's first-occurrence table is a
map-side-combinable MIN aggregate on the paragraph string — the
boilerplate mega-key partial-aggregates per task, so the hot key ships
one row per task, not one row per occurrence; the keep-side join back on
the paragraph key is the one skewed shuffle and sits under AQE skew
split (the dedup-family mega-bucket rationale, operators/dedup.py).
Per-doc reassembly collects O(doc length) paragraph structs per group —
the docs_token_shards / pack_sequences bounded-group contract.

Reference: the reference stores raw untreated message bodies
(etl_service/main.py:231-238) and has no markup or dedup surface; these
model the curation stages its corpus consumers would need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import whitespace_tokens
from .registry import query
from .text import _SQL_AUGMENTED, _augmented_corpus

# -- CCNet paragraph dedup ------------------------------------------------

# Paragraph grid: consecutive 10-token chunks of the lowercased
# whitespace tokenization (the docs_repeated_chunks grid, one size up),
# shared with the streaming index via operators/paragraphs.py.
from ..operators.paragraphs import PARA_TOKENS as _PARA_TOKENS  # noqa: E402

# Two planted boilerplate paragraphs (newsletter plug / legal footer),
# appended as WHOLE paragraphs after chunking so they are bit-identical
# across documents regardless of each document's token count mod 10.
# Selector is the md5-derived bucket idiom (_QB_SEL_SQL precedent):
# bucket 1 -> BP1 (~1/3 of docs), bucket 2 -> BP2, bucket 0 -> none.
_BP1 = "subscribe to our newsletter for updates and exclusive offers today"
_BP2 = "all rights reserved terms of service privacy policy contact us"

_SEL_SQL = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT) % 3"
)

_SQL_TOKS = r"regexp_split_to_array(trim(lower({c})), '\s+')"


@query(
    "curation_line_dedup",
    oracle=f"""
WITH corpus AS ({_SQL_AUGMENTED}),
tok AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE {_SQL_TOKS.format(c='text')} END AS toks
  FROM corpus
),
chunked AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, (len(toks) + {_PARA_TOKENS - 1}) // {_PARA_TOKENS}),
           i -> array_to_string(
                  toks[(i-1)*{_PARA_TOKENS}+1:(i-1)*{_PARA_TOKENS}+{_PARA_TOKENS}],
                  ' ')) AS paras0,
         {_SEL_SQL} AS sel
  FROM tok
),
planted AS (
  SELECT doc_id,
         CASE sel WHEN 1 THEN list_append(paras0, '{_BP1}')
                  WHEN 2 THEN list_append(paras0, '{_BP2}')
                  ELSE paras0 END AS paras
  FROM chunked
),
p AS (
  SELECT doc_id, s.pos AS pos, s.para AS para FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(paras)),
                  i -> {{'pos': i, 'para': paras[i]}})) AS s
    FROM planted
  )
),
ranked AS (
  SELECT doc_id, pos, para,
         ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
  FROM p
),
kept AS (SELECT doc_id, pos, para FROM ranked WHERE rn = 1),
perdoc AS (SELECT doc_id, COUNT(*) AS n_paras FROM p GROUP BY doc_id),
reasm AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         array_to_string(list(para ORDER BY pos), ' ') AS clean
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(d.n_paras AS BIGINT) AS n_paras,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(strlen(COALESCE(r.clean, '')) AS BIGINT) AS clean_len,
       md5(COALESCE(r.clean, '')) AS clean_hash
FROM perdoc d LEFT JOIN reasm r USING (doc_id)
""",
)
def curation_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-level paragraph dedup with document REWRITING
    (Wenzek et al. 2020 sec. 3.1): every 10-token paragraph is grouped
    corpus-wide, only the first occurrence by (doc_id, pos) survives,
    and each document is reassembled from its surviving paragraphs —
    the transform the find-only dedup family (repeated chunks,
    ExactSubstr spans) stops short of. Exact copies collapse to an
    empty rewrite, near copies keep only their divergent tail chunk,
    and the two planted boilerplate paragraphs (md5-bucketed onto ~2/3
    of docs) dedup to their two corpus-first occurrences.

    First-occurrence is a MIN(struct(doc_id, pos)) aggregate on the
    paragraph string — partial-aggregatable, so the boilerplate
    mega-key combines map-side (one row per task reaches the reduce;
    the window-function formulation would instead SORT the mega-key's
    occurrence list on one reducer). The oracle keeps the windowed
    formulation — same answer, scale-free engine. Join back on the
    paragraph key is N:1 and AQE-skew-splittable; reassembly collects
    O(doc-length) structs per doc (the pack_sequences bounded-group
    contract). Paragraph keys are compared as the full string on both
    engines — no hash function to disagree on."""
    from ..operators.paragraphs import para_arrays

    corpus = _augmented_corpus(load_table(spark, sf_dir, "documents"))
    # the paragraph grid is the SHARED operator (operators/paragraphs.py,
    # HOF-hazard-staged there) so the streaming first-occurrence index
    # (streaming/para_dedup.py) chunks bit-identically
    chunked = para_arrays(corpus, para_tokens=_PARA_TOKENS).select(
        "doc_id",
        F.col("paras").alias("paras0"),
        (
            F.conv(
                F.substring(
                    F.md5(F.col("doc_id").cast("string")), 1, 15
                ),
                16,
                10,
            ).cast("bigint")
            % 3
        ).alias("sel"),
    )
    planted = chunked.select(
        "doc_id",
        F.when(
            F.col("sel") == 1,
            F.concat(F.col("paras0"), F.array(F.lit(_BP1))),
        )
        .when(
            F.col("sel") == 2,
            F.concat(F.col("paras0"), F.array(F.lit(_BP2))),
        )
        .otherwise(F.col("paras0"))
        .alias("paras"),
    )
    from ..operators.paragraphs import explode_paras

    p = explode_paras(planted)
    first = p.groupBy("para").agg(
        F.min(F.struct("doc_id", "pos")).alias("k")
    )
    kept = (
        p.join(first, "para")
        .where(
            (F.col("doc_id") == F.col("k.doc_id"))
            & (F.col("pos") == F.col("k.pos"))
        )
        .select("doc_id", "pos", "para")
    )
    perdoc = p.groupBy("doc_id").agg(F.count("*").alias("n_paras"))
    reasm = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda x: x["para"],
            ),
            " ",
        ).alias("clean"),
    )
    return perdoc.join(reasm, "doc_id", "left").select(
        "doc_id",
        F.col("n_paras").cast("bigint").alias("n_paras"),
        F.coalesce(F.col("n_kept"), F.lit(0))
        .cast("bigint")
        .alias("n_kept"),
        F.length(F.coalesce(F.col("clean"), F.lit("")))
        .cast("bigint")
        .alias("clean_len"),
        F.md5(F.coalesce(F.col("clean"), F.lit(""))).alias("clean_hash"),
    )


# -- HTML main-content extraction -----------------------------------------

# Deterministic page template planted on BOTH sides: head noise (title/
# style/script), a nav full of links, an ads div (link + teaser), the
# document's text as 20-token <p> blocks, and a short footer. Every
# boilerplate organ is designed to fail a DIFFERENT keep-rule: nav and
# ads fail link density, footer fails the short-block cut — and a
# document whose tail <p> chunk has < 5 tokens loses that block too, so
# the short-block rule also has data-dependent content failures.
_HTML_BLOCK_TOKENS = 20
_PAT_BLOCK = r"<(p|nav|div[^>]*|footer)>(.*?)</(?:p|nav|div|footer)>"
_PAT_TAG = r"<[^>]+>"
_MIN_BLOCK_TOKENS = 5

_SQL_PAGE = f"""
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE {_SQL_TOKS.format(c='text')} END AS toks,
         source
  FROM documents
""".strip()


@query(
    "curation_html_extract",
    oracle=f"""
WITH tok AS ({_SQL_PAGE}),
page AS (
  SELECT doc_id,
         '<html><head><title>' || source ||
         '</title><style>p{{margin:0}}</style>' ||
         '<script>var a=1;</script></head><body>' ||
         '<nav><a href="/">home</a> <a href="/about">about us</a></nav>' ||
         '<div class="ads"><a href="/buy">buy now</a> limited time offer</div>' ||
         array_to_string(list_transform(
           generate_series(1, (len(toks) + {_HTML_BLOCK_TOKENS - 1}) // {_HTML_BLOCK_TOKENS}),
           i -> '<p>' || array_to_string(
                  toks[(i-1)*{_HTML_BLOCK_TOKENS}+1:(i-1)*{_HTML_BLOCK_TOKENS}+{_HTML_BLOCK_TOKENS}],
                  ' ') || '</p>'), '') ||
         '<footer>copyright example corp</footer></body></html>' AS html,
         array_to_string(toks, ' ') AS orig_norm
  FROM tok
),
blocks AS (
  SELECT doc_id, orig_norm,
         regexp_extract_all(
           regexp_replace(
             regexp_replace(html, '<script>.*?</script>', '', 'g'),
             '<style>.*?</style>', '', 'g'),
           '{_PAT_BLOCK}', 2) AS bl
  FROM page
),
b AS (
  SELECT doc_id, orig_norm, len(bl) AS n_blocks, s.pos AS pos, s.raw AS raw
  FROM (
    SELECT doc_id, orig_norm, bl,
           unnest(list_transform(generate_series(1, len(bl)),
                  i -> {{'pos': i, 'raw': bl[i]}})) AS s
    FROM blocks
  )
),
feat AS (
  SELECT doc_id, orig_norm, n_blocks, pos,
         trim(regexp_replace(regexp_replace(raw, '{_PAT_TAG}', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS btext,
         len(regexp_extract_all(raw, '<a href')) AS n_links
  FROM b
),
cls AS (
  SELECT doc_id, orig_norm, n_blocks, pos, btext,
         n_links = 0 AND btext <> ''
           AND len(regexp_split_to_array(btext, ' ')) >= {_MIN_BLOCK_TOKENS}
           AS keep
  FROM feat
),
agg AS (
  SELECT doc_id, ANY_VALUE(orig_norm) AS orig_norm,
         ANY_VALUE(n_blocks) AS n_blocks,
         CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         COALESCE(array_to_string(
           list(btext ORDER BY pos) FILTER (WHERE keep), ' '), '') AS extracted
  FROM cls GROUP BY doc_id
)
SELECT doc_id, CAST(n_blocks AS BIGINT) AS n_blocks, n_kept,
       CAST(strlen(extracted) AS BIGINT) AS extract_len,
       md5(extracted) AS extract_hash,
       extracted = orig_norm AS lossless
FROM agg
""",
)
def curation_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML main-content extraction (jusText-family block classification,
    Pomikalek 2011; the raw-crawl-to-text stage of C4/RefinedWeb):
    strip script/style, split the page into tag-delimited blocks, keep
    a block iff it has NO links and >= 5 tokens (the link-density and
    short-block heuristics), reassemble the article from kept blocks in
    page order. Each document is wrapped into a deterministic page on
    both engines — nav and ads organs fail the link rule, the footer
    fails the short-block rule, and short tail <p> chunks give the
    short-block rule data-dependent content failures, so every rule is
    non-vacuous (the quality-battery planted-dirt discipline). The
    `lossless` bit marks documents whose extraction round-trips to the
    normalized original — true exactly when no tail chunk was dropped.

    Plan: pure per-row regex projection (RE2-and-Java-compatible
    patterns, the text_pii_redaction contract) + one constant-fan-out
    posexplode + one per-doc re-aggregation; zero joins, scan-bound at
    any scale. The block battery runs ONE pass over each page string;
    per-block features are staged attributes so no regex is
    re-evaluated per element (the HOF re-evaluation hazard)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", whitespace_tokens("text").alias("toks"), "source"
    )
    page = tok.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>"),
            F.col("source"),
            F.lit(
                "</title><style>p{margin:0}</style>"
                "<script>var a=1;</script></head><body>"
                '<nav><a href="/">home</a> <a href="/about">about us</a></nav>'
                '<div class="ads"><a href="/buy">buy now</a>'
                " limited time offer</div>"
            ),
            F.expr(
                f"array_join(CASE WHEN size(toks) = 0 "
                f"THEN CAST(array() AS ARRAY<STRING>) "
                f"ELSE transform(sequence(1, (size(toks) + "
                f"{_HTML_BLOCK_TOKENS - 1}) div {_HTML_BLOCK_TOKENS}), "
                f"i -> concat('<p>', array_join(slice(toks, "
                f"(i-1)*{_HTML_BLOCK_TOKENS}+1, {_HTML_BLOCK_TOKENS}), "
                f"' '), '</p>')) END, '')"
            ),
            F.lit("<footer>copyright example corp</footer></body></html>"),
        ).alias("html"),
        F.array_join("toks", " ").alias("orig_norm"),
    )
    blocks = page.select(
        "doc_id",
        "orig_norm",
        F.regexp_extract_all(
            F.regexp_replace(
                F.regexp_replace(
                    F.col("html"), "<script>.*?</script>", ""
                ),
                "<style>.*?</style>",
                "",
            ),
            F.lit(_PAT_BLOCK),
            F.lit(2),
        ).alias("bl"),
    )
    b = blocks.select(
        "doc_id",
        "orig_norm",
        F.size("bl").alias("n_blocks"),
        F.posexplode("bl").alias("pos0", "raw"),
    ).select(
        "doc_id",
        "orig_norm",
        "n_blocks",
        (F.col("pos0") + 1).alias("pos"),
        "raw",
    )
    feat = b.select(
        "doc_id",
        "orig_norm",
        "n_blocks",
        "pos",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("raw"), _PAT_TAG, " "),
                r"\s+",
                " ",
            )
        ).alias("btext"),
        F.size(
            F.regexp_extract_all(F.col("raw"), F.lit("<a href"), F.lit(0))
        ).alias("n_links"),
    )
    cls = feat.select(
        "doc_id",
        "orig_norm",
        "n_blocks",
        "pos",
        "btext",
        (
            (F.col("n_links") == 0)
            & (F.col("btext") != "")
            & (
                F.size(F.split(F.col("btext"), " "))
                >= _MIN_BLOCK_TOKENS
            )
        ).alias("keep"),
    )
    agg = cls.groupBy("doc_id").agg(
        F.first("orig_norm").alias("orig_norm"),
        F.first("n_blocks").alias("n_blocks"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct("pos", "btext"),
                            )
                        )
                    ),
                    lambda x: x["btext"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("extracted"),
    )
    return agg.select(
        "doc_id",
        F.col("n_blocks").cast("bigint").alias("n_blocks"),
        "n_kept",
        F.length("extracted").cast("bigint").alias("extract_len"),
        F.md5("extracted").alias("extract_hash"),
        (F.col("extracted") == F.col("orig_norm")).alias("lossless"),
    )


# -- hyperlink graph extraction + PageRank --------------------------------

# Each page carries a planted "related" list of 3 outlinks whose targets
# are md5-derived pseudo-random doc_ids mod the corpus size — a
# deterministic, corpus-derived link graph both engines can predict
# analytically (the dHash raster precedent: the ORACLE never parses a
# page; the Spark side must extract every edge from the markup).
_N_OUTLINKS = 3

_SQL_LINK_EDGES_HEAD = f"""WITH nd AS (SELECT COUNT(*) AS n FROM documents),
t AS (SELECT doc_id, unnest([{", ".join(str(k) for k in range(1, _N_OUTLINKS + 1))}]) AS k
      FROM documents),
e0 AS (
  SELECT DISTINCT u, v FROM (
    SELECT doc_id AS u,
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
                 CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) % nd.n AS v
    FROM t, nd
  ) WHERE v <> u AND v IN (SELECT doc_id FROM documents)
),
edges AS MATERIALIZED (
  SELECT u, v FROM e0
  UNION
  SELECT v, u FROM e0
)"""


def _link_rank_oracle() -> str:
    from .text import pagerank_rounds_sql

    return pagerank_rounds_sql(_SQL_LINK_EDGES_HEAD, iters=5)


@query("webcorpus_link_rank", oracle=_link_rank_oracle())
def webcorpus_link_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperlink-graph selection, WebText-style (Radford et al. 2019
    built WebText from link popularity; Page et al. 1999 is the
    centrality): pages -> EXTRACT the anchor targets from the markup ->
    link graph -> integer fixed-point PageRank, one lazy plan. Each
    planted page carries a related-links organ with 3 md5-derived
    outlink targets; the Spark side must recover every edge by parsing
    `<a href="/doc/N">` out of the full page (nav/ads links don't match
    the doc-link pattern — extraction has to discriminate), while the
    oracle predicts the same edge set analytically and replays the
    pagerank_units rounds as unrolled CTEs, bit-for-bit.

    Plan: page build + regex extraction are one scan-bound projection;
    the corpus size enters as a broadcast 1-row aggregate (the
    scalar-carry idiom), never a driver constant; the fixed-point is
    pagerank_units' checkpointed rounds. At 100 TB the extraction stage
    is the same map-only pass and the graph rounds shuffle on node id."""
    from ..operators.components import pagerank_units

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", whitespace_tokens("text").alias("toks"), "source"
    )
    nd = tok.agg(F.count("*").alias("n"))
    ks = F.array(*[F.lit(k) for k in range(1, _N_OUTLINKS + 1)])
    link_items = F.array_join(
        F.transform(
            ks,
            lambda k: F.concat(
                F.lit('<li><a href="/doc/'),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("doc_id").cast("string"),
                                    F.lit(":"),
                                    k.cast("string"),
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("bigint")
                    % F.col("n")
                ).cast("string"),
                F.lit('">related</a></li>'),
            ),
        ),
        "",
    )
    page = tok.crossJoin(F.broadcast(nd)).select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>"),
            F.col("source"),
            F.lit(
                "</title></head><body>"
                '<nav><a href="/">home</a> <a href="/about">about us</a></nav>'
                '<div class="ads"><a href="/buy">buy now</a>'
                ' limited time offer</div><ul class="related">'
            ),
            link_items,
            F.lit("</ul><p>"),
            F.array_join(F.slice("toks", 1, _HTML_BLOCK_TOKENS), " "),
            F.lit("</p><footer>copyright example corp</footer></body></html>"),
        ).alias("html"),
    )
    hrefs = page.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.col("html"), F.lit('<a href="/doc/([0-9]+)">'), F.lit(1)
            )
        ).alias("dst"),
    )
    # resolve anchors against the corpus: out-of-corpus targets are
    # dropped (real crawls link outside the crawl; with sparse doc_id
    # spaces -- scratch/sf1 -- the mod-n draw lands on ids that do not
    # exist, and un-resolved they would inflate the graph with phantom
    # nodes). Hash semi-join on the uniform doc_id key, linear.
    edges = (
        hrefs.select(
            F.col("doc_id").alias("id_a"),
            F.col("dst").cast("bigint").alias("id_b"),
        )
        .where(F.col("id_b") != F.col("id_a"))
        .join(
            docs.select(F.col("doc_id").alias("id_b")),
            "id_b",
            "left_semi",
        )
        .distinct()
    )
    return pagerank_units(edges)
