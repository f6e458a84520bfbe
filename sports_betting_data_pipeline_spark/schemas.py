"""Declared schemas for every dataset the engine touches.

The reference never declares schemas — fields exist only as ``.get()``
access patterns on JSON dicts (SURVEY.md §1.2, mm_calls.py:17-26).
That implicit-schema design is the first thing idiomatic Spark fixes:
every shape is a StructType declared once here, and ingest casts to it
immediately (spark.read inference is never trusted on the hot path).

Citations map each struct/field to the reference access site that
defines it.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Nested sports-betting event tree (FIXTURES.md §B).
#
# event -> markets[] -> (market_lines[] ->) selections[][]
# Access sites: event fields main.py:89-96/123, competitors
# main.py:97-110 (exactly 2 assumed), market main.py:81-82/111-114,
# market_line main.py:115-119, selection main.py:120-125 +
# mm_calls.py:246-249. Selections are a LIST OF LISTS (sides x ladder
# depth): branch A takes only selection[0] (main.py:120), branch B
# iterates the inner list (main.py:135-136).
# ---------------------------------------------------------------------------

SELECTION = T.StructType(
    [
        T.StructField("line_id", T.StringType()),
        T.StructField("display_name", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("odds", T.IntegerType()),
        T.StructField("stake", T.DoubleType()),
        T.StructField("value", T.DoubleType()),
    ]
)

COMPETITOR = T.StructType(
    [
        T.StructField("display_name", T.StringType()),
        T.StructField("abbreviation", T.StringType()),
        T.StructField("side", T.StringType()),
    ]
)

MARKET_LINE = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("line", T.DoubleType()),
        T.StructField("favourite", T.StringType()),  # default "NA" (main.py:118)
        T.StructField("type", T.StringType()),
        T.StructField("selections", T.ArrayType(T.ArrayType(SELECTION))),
    ]
)

MARKET = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),  # 'moneyline' | ... (mm_calls.py:239)
        T.StructField("status", T.StringType()),
        # EPOCH NANOSECONDS (divided by 1e9 at main.py:126-128). Spark
        # timestamps are µs precision; the temporal kit truncates ns→µs
        # and documents the delta (SURVEY.md §1.3).
        T.StructField("updated_at", T.LongType()),
        # NULL => flatten branch B (main.py:82).
        T.StructField("market_lines", T.ArrayType(MARKET_LINE)),
        # Used only when market_lines is null (main.py:135-136).
        T.StructField("selections", T.ArrayType(T.ArrayType(SELECTION))),
    ]
)

SPORT_EVENT = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("display_name", T.StringType()),
        # ISO-8601 UTC string "yyyy-MM-dd'T'HH:mm:ss'Z'" (main.py:89-92).
        T.StructField("scheduled", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("competitors", T.ArrayType(COMPETITOR)),
        T.StructField("markets", T.ArrayType(MARKET)),
    ]
)

TOURNAMENT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("sport_events", T.ArrayType(SPORT_EVENT)),
    ]
)

# Flat 25-column sheet row (main.py:50-78): all strings, this order.
SHEET_COLUMNS = (
    "Event ID",
    "Event Scheduled Time",
    "Event Name",
    "Event Competitor 1",
    "Event Competitor 1 Abbreviation",
    "Event Competitor 1 Side",
    "Event Competitor 2",
    "Event Competitor 2 Abbreviation",
    "Event Competitor 2 Side",
    "Market ID",
    "Market Name",
    "Market Type",
    "Market Status",
    "Market Line ID",
    "Market Line Name",
    "Market Line",
    "Market Line Favourite",
    "Market Line Type",
    "Selection ID",
    "Selection Name",
    "Selection Odds",
    "Event Status",
    "Selection Stake",
    "Selection Value",
    "Market Updated",
)

SHEET_ROW = T.StructType([T.StructField(c, T.StringType()) for c in SHEET_COLUMNS])

# Wager lifecycle records (mm_calls.py:245-252, 261, 279-280, 325).
WAGER = T.StructType(
    [
        T.StructField("external_id", T.StringType()),  # uuid (mm_calls.py:245)
        T.StructField("wager_id", T.StringType()),  # server id (mm_calls.py:261)
        T.StructField("line_id", T.StringType()),
        T.StructField("odds", T.IntegerType()),
        T.StructField("stake", T.DoubleType()),
        T.StructField("action", T.StringType()),  # 'place' | 'cancel'
        T.StructField("ts", T.TimestampType()),
    ]
)

# Streaming wire message: Pusher envelope, payload = base64(JSON)
# (mm_calls.py:164-174).
PUSHER_MESSAGE = T.StructType(
    [
        T.StructField("channel", T.StringType()),
        T.StructField("event", T.StringType()),  # e.g. 'tournament_<id>'
        T.StructField("payload", T.StringType()),  # base64-encoded JSON
    ]
)

# Driver fixture tables (FIXTURES.md §A) — declared so streaming readers
# and tests never rely on inference.
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON, e.g. {"k": 87}
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# Multimodal asset column family (SURVEY.md §2.10 / build brief): opaque
# binary payload + typed metadata. Decode/feature-extract runs as Pandas
# UDFs over mapInPandas (functions/multimodal.py).
MEDIA_ASSET = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # 'image'|'audio'|'video'
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)

# The odds ladder (src/constants.py:1-291) lives in functions/odds.py
# with the full snap/draw/conversion kit.
