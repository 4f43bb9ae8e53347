"""Explicit schemas (SURVEY.md §1.4).

The reference declares schemas positionally as comma-joined field strings
(``Seetings/StreamTableSeetings.java:6``,
``Seetings/DimensionTableSeetings.java:7-8``) and extracts CDC payload
fields by ordinal position in the JSON entry set
(``utils/JsonFilter.java:47-54``) — a fragility we replace with explicit
StructTypes and by-name access via ``from_json``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Canal flat-message CDC envelope (reference README.md:362-611,
# utils/BinLogBean.java:14-27). All `data`/`old` leaf values arrive as
# strings — Canal stringifies every MySQL value.
# ---------------------------------------------------------------------------

# The 20 columns of t_meeting_info (reference README.md:21-46).
MEETING_INFO_COLUMNS = [
    "id", "meeting_code", "msite", "mcontent", "attend_count", "type",
    "status", "address_id", "email", "contact_tel", "create_user_name",
    "create_user_id", "creator_org", "mstart_date", "mend_date",
    "create_time", "update_user", "update_time", "company", "sign_status",
]

_MEETING_ROW_STRUCT = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in MEETING_INFO_COLUMNS]
)

CANAL_ENVELOPE_SCHEMA = T.StructType([
    T.StructField("data", T.ArrayType(_MEETING_ROW_STRUCT), True),
    T.StructField("database", T.StringType(), True),
    T.StructField("es", T.LongType(), True),        # event time, epoch ms
    T.StructField("id", T.LongType(), True),        # binlog sequence no.
    T.StructField("isDdl", T.BooleanType(), True),
    T.StructField("mysqlType", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("old", T.ArrayType(_MEETING_ROW_STRUCT), True),
    T.StructField("pkNames", T.ArrayType(T.StringType()), True),
    T.StructField("sql", T.StringType(), True),
    T.StructField("sqlType", T.MapType(T.StringType(), T.IntegerType()), True),
    T.StructField("table", T.StringType(), True),
    T.StructField("ts", T.LongType(), True),        # log time, epoch ms
    T.StructField("type", T.StringType(), True),    # INSERT | UPDATE | DELETE
])

# Stream table `meeting_info` (Seetings/StreamTableSeetings.java:6); the
# trailing proctime attribute is emulated with current_timestamp() at
# micro-batch evaluation time (SURVEY.md §2.8 T6).
MEETING_INFO_SCHEMA = T.StructType([
    T.StructField("meeting_id", T.IntegerType(), True),
    T.StructField("meeting_code", T.StringType(), True),
    T.StructField("address_id", T.IntegerType(), True),
    T.StructField("mstart_date", T.StringType(), True),
    T.StructField("mend_date", T.StringType(), True),
])

# Dimension table `meeting_address` (Seetings/DimensionTableSeetings.java:7-8,
# types Seetings/CreateJDBCInputFormat.java:14-20).
MEETING_ADDRESS_SCHEMA = T.StructType([
    T.StructField("meetingroom_id", T.IntegerType(), True),
    T.StructField("meetingroom_name", T.StringType(), True),
    T.StructField("location_id", T.StringType(), True),
    T.StructField("location_name", T.StringType(), True),
    T.StructField("city", T.StringType(), True),
])

# Result `meeting_result` (model/Meeting.java:13-18, sink DML
# sinks/SinkToGreenplum.java:33 / SinkToMySQL.java:35). Upsert key:
# meeting_id (REPLACE INTO semantics).
MEETING_RESULT_SCHEMA = T.StructType([
    T.StructField("meeting_id", T.IntegerType(), True),
    T.StructField("meeting_code", T.StringType(), True),
    T.StructField("meetingroom_id", T.IntegerType(), True),
    T.StructField("meetingroom_name", T.StringType(), True),
    T.StructField("location_name", T.StringType(), True),
    T.StructField("city", T.StringType(), True),
])

# Driver fixture tables (/root/testdata/sf*/; FIXTURES.md §B).
FIXTURE_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# events.props is a JSON string — the fixture analogue of the CDC
# envelope's nested JSON payload (E7, utils/JsonFilter.java:24).
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])
