"""Static schemas (StructTypes).

The reference declares its schemas as Scala case classes in
``util/Protocol.scala`` (reference ``Protocol.scala:7-61``) and
deserializes line-delimited JSON into them with json4s
(``util/CommitParser.scala:13-22``). In Spark the parser classes
disappear entirely: schema-on-read (``spark.read.schema(S).json``)
parses, prunes, and null-handles in the JVM.

Mapping rules (SURVEY §1.3): ``Option[T]`` → nullable field,
``List[T]`` → ArrayType, ``java.util.Date`` → TimestampType, nested
case class → StructType.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# --- Reference input schemas (Protocol.scala:7-54) -----------------------

COMMIT_USER = StructType(  # Protocol.scala:24
    [_f("name", StringType()), _f("email", StringType()), _f("date", TimestampType())]
)

USER = StructType(  # Protocol.scala:26-30
    [
        _f("id", LongType()),
        _f("login", StringType()),
        _f("avatar_url", StringType()),
        _f("type", StringType()),
        _f("site_admin", BooleanType()),
    ]
)

VERIFICATION = StructType(  # Protocol.scala:32-35
    [
        _f("verified", BooleanType()),
        _f("reason", StringType()),
        _f("signature", StringType()),  # Option[String]
        _f("payload", StringType()),  # Option[String]
    ]
)

STATS = StructType(  # Protocol.scala:37
    [_f("total", IntegerType()), _f("additions", IntegerType()), _f("deletions", IntegerType())]
)

FILE = StructType(  # Protocol.scala:39-48
    [
        _f("sha", StringType()),
        _f("filename", StringType()),  # Option[String] — null sometimes
        _f("status", StringType()),  # Option[String]
        _f("additions", IntegerType()),
        _f("deletions", IntegerType()),
        _f("changes", IntegerType()),
        _f("blob_url", StringType()),
        _f("raw_url", StringType()),
        _f("contents_url", StringType()),
        _f("patch", StringType()),
    ]
)

COMMIT_DATA = StructType(  # Protocol.scala:17-22
    [
        _f("author", COMMIT_USER),
        _f("committer", COMMIT_USER),  # event-time = commit.committer.date
        _f("message", StringType()),
        _f("tree", StructType([_f("sha", StringType())])),
        _f("comment_count", IntegerType()),
        _f("verification", VERIFICATION),
    ]
)

COMMIT = StructType(  # Protocol.scala:7-15
    [
        _f("node_id", StringType()),
        _f("sha", StringType()),
        _f("url", StringType()),
        _f("commit", COMMIT_DATA),
        _f("author", USER),  # Option[User]
        _f("committer", USER),  # Option[User]
        _f("parents", ArrayType(StructType([_f("sha", StringType())]))),
        _f("stats", STATS),  # Option[Stats] — null on some rows (Q1/Q6/Q7)
        _f("files", ArrayType(FILE)),
    ]
)

COMMIT_GEO = StructType(  # Protocol.scala:54
    [
        _f("sha", StringType()),
        _f("createdAt", TimestampType()),
        _f("continent", StringType()),
    ]
)

# Q7 output schema (Protocol.scala:56-61)
COMMIT_SUMMARY = StructType(
    [
        _f("repo", StringType()),
        _f("date", StringType()),  # "dd-MM-yyyy"
        _f("amountOfCommits", IntegerType()),
        _f("amountOfCommitters", IntegerType()),
        _f("totalChanges", IntegerType()),
        _f("mostPopularCommitter", StringType()),
    ]
)

# --- Synthetic test tables (TESTDATA.md / FIXTURES.md §B) ----------------

EVENTS = StructType(
    [
        _f("event_id", LongType()),
        _f("ts", TimestampType()),
        _f("user_id", LongType()),
        _f("event_type", StringType()),
        _f("value", DoubleType()),
        _f("props", StringType()),  # JSON string, e.g. '{"k": 87}'
    ]
)

DOCUMENTS = StructType(
    [
        _f("doc_id", LongType()),
        _f("text", StringType()),
        _f("lang", StringType()),
        _f("source", StringType()),
        _f("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        _f("vec_id", LongType()),
        _f("embedding", ArrayType(FloatType())),
        _f("label", IntegerType()),
    ]
)

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

ALL_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")
