"""HTML → text extraction — step 0 of a web-corpus pipeline.

C4/CCNet-style corpora start from crawled HTML; before any quality
gate, dedup, or tokenizer sees a document it must be stripped to
text (Raffel et al. 2020 §2.2 describe exactly this order). The
container ships no HTML parser (and a 100 TB pass wouldn't want a
per-row Python DOM anyway), so the extractor is a fixed chain of
Catalyst ``regexp_replace`` stages — JVM-side, whole-stage-codegen
friendly, zero Python in the row path:

1. drop ``<script>``/``<style>``/``<!-- -->`` blocks wholesale
   (content AND tags — executable/presentation payloads must not
   leak into training text);
2. turn block-level closers (``</p>``, ``</div>``, ``<br>``, …)
   into newlines so paragraph structure survives;
3. strip every remaining tag;
4. decode the named entities that matter for text statistics
   (``&amp; &lt; &gt; &quot; &#39; &nbsp;``);
5. collapse runs of spaces/tabs and blank lines, trim.

Every pattern is written in the Java∩RE2 common dialect (no
lookarounds, no backreferences) so the DuckDB oracle runs the SAME
chain with ``regexp_replace(..., 'g')`` and the result is
value-hash exact — the property q156 checks. ``(?s)`` inline flags
make ``.`` span newlines in both engines; tag-name matches are
``(?i)`` case-insensitive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) — ORDER MATTERS; mirrored verbatim in the
# DuckDB oracle (functions/scalar-style shared constant).
HTML_STRIP_STAGES: list[tuple[str, str]] = [
    # 1. script/style/comment blocks, content included
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    # 2. block boundaries → newline (so q20-style stats see lines)
    (r"(?i)</(p|div|li|h1|h2|h3|h4|h5|h6|tr|table|blockquote)>", "\n"),
    (r"(?i)<br[^>]*>", "\n"),
    # 3. every remaining tag
    (r"(?s)<[^>]+>", " "),
    # 4. the load-bearing named entities
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),  # LAST: &amp;lt; must decode to &lt;, not <
    # 5. whitespace normalization
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
]


def html_to_text(html: Column) -> Column:
    """Extracted text of an HTML column (see module docstring for the
    stage chain). Pure Catalyst — at 100 TB this runs inside the scan
    stage's whole-stage codegen, no shuffle, no Python."""
    out = html
    for pat, rep in HTML_STRIP_STAGES:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def html_strip_sql(col_expr: str) -> str:
    """The SAME chain as a DuckDB SQL expression (nested
    regexp_replace with the 'g' flag) — the oracle mirror.

    DuckDB's RE2 accepts the identical patterns because the chain
    avoids every Java-only construct (lookaround, backreferences,
    possessive quantifiers)."""
    out = col_expr
    for pat, rep in HTML_STRIP_STAGES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''").replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"
