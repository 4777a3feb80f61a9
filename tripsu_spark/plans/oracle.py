"""DuckDB-oracle SQL mirroring the Spark pipeline, CTE by CTE.

Every string here is ANSI SQL runnable by DuckDB against the
pre-registered testdata views (events, documents, embeddings, ...).
They re-derive — independently of any Spark code — the same results as
the DataFrame implementations in operators/ and plans/, for the
driver's CORRECTNESS gate and for local verification.

Shared fixed parameters (KG base, rules, salt) are module constants so
Spark and SQL cannot drift apart silently.
"""

from __future__ import annotations

import hashlib

from ..operators.extract import KG, RDF_TYPE, XSD_DATETIME, XSD_INTEGER

# Fixed bench secret (32 bytes) -> sha256 salt used by oracle-checked
# pseudonymization queries. Must stay in sync with entry()/queries().
BENCH_SECRET = b"bench-secret-0123456789abcdefghi"


def bench_salt() -> str:
    from ..crypto import derive_key

    return derive_key(BENCH_SECRET).hex()


TRANSCRIPTS_CTE = """
transcripts AS (
  SELECT
    'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS turn_idx,
    CASE WHEN event_type = 'error' THEN 'system'
         WHEN event_type IN ('signup', 'purchase') THEN 'user'
         ELSE 'assistant' END AS role,
    'user @user' || CAST(user_id AS VARCHAR) || ' did ' || event_type
      || ' on #item' || CAST(event_id % 50 AS VARCHAR) || ' props=' || props AS text,
    CASE WHEN event_type = 'purchase' THEN 'checkout'
         WHEN event_type = 'click' THEN 'browser'
         ELSE NULL END AS tool,
    ts
  FROM events
)
"""

# Triple extraction as SQL — mirrors operators/extract.py::extract_triples.
TRIPLES_CTE = f"""
user_mentions AS (
  SELECT conv_id, turn_idx,
         unnest(regexp_extract_all(text, '@user(\\d+)', 1)) AS eid
  FROM transcripts
),
item_mentions AS (
  SELECT conv_id, turn_idx,
         unnest(regexp_extract_all(text, '#item(\\d+)', 1)) AS eid
  FROM transcripts
),
user_links AS (
  SELECT conv_id, eid, COUNT(*) AS n FROM user_mentions GROUP BY conv_id, eid
),
item_links AS (
  SELECT conv_id, eid, COUNT(*) AS n FROM item_mentions GROUP BY conv_id, eid
),
triples AS (
  SELECT 'iri' AS s_kind, '{KG}conv/' || conv_id AS s_value,
         '{RDF_TYPE}' AS predicate,
         'iri' AS o_kind, '{KG}Conversation' AS o_value,
         CAST(NULL AS VARCHAR) AS o_datatype, CAST(NULL AS VARCHAR) AS o_lang
  FROM (SELECT DISTINCT conv_id FROM transcripts)
  UNION ALL
  SELECT 'iri', '{KG}turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         '{RDF_TYPE}', 'iri', '{KG}Turn', NULL, NULL
  FROM transcripts
  UNION ALL
  SELECT 'iri', '{KG}turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         '{KG}partOf', 'iri', '{KG}conv/' || conv_id, NULL, NULL
  FROM transcripts
  UNION ALL
  SELECT 'iri', '{KG}turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         '{KG}hasRole', 'literal', role, NULL, NULL
  FROM transcripts
  UNION ALL
  SELECT 'iri', '{KG}turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         '{KG}hasText', 'literal', text, NULL, NULL
  FROM transcripts
  UNION ALL
  SELECT 'iri', '{KG}turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         '{KG}ts', 'literal', strftime(ts, '%Y-%m-%dT%H:%M:%S'),
         '{XSD_DATETIME}', NULL
  FROM transcripts WHERE ts IS NOT NULL
  UNION ALL
  SELECT 'iri', '{KG}turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         '{KG}usedTool', 'iri', '{KG}tool/' || tool, NULL, NULL
  FROM transcripts WHERE tool IS NOT NULL
  UNION ALL
  SELECT 'iri', '{KG}tool/' || tool, '{RDF_TYPE}', 'iri', '{KG}Tool', NULL, NULL
  FROM (SELECT DISTINCT tool FROM transcripts WHERE tool IS NOT NULL)
  UNION ALL
  SELECT 'iri', '{KG}turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         '{KG}mentions', 'iri', '{KG}user/' || eid, NULL, NULL
  FROM user_mentions
  UNION ALL
  SELECT 'iri', '{KG}turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         '{KG}mentions', 'iri', '{KG}item/' || eid, NULL, NULL
  FROM item_mentions
  UNION ALL
  SELECT 'iri', '{KG}user/' || eid, '{RDF_TYPE}', 'iri', '{KG}User', NULL, NULL
  FROM (SELECT DISTINCT eid FROM user_mentions)
  UNION ALL
  SELECT 'iri', '{KG}item/' || eid, '{RDF_TYPE}', 'iri', '{KG}Item', NULL, NULL
  FROM (SELECT DISTINCT eid FROM item_mentions)
  UNION ALL
  SELECT 'iri', '{KG}link/' || conv_id || '/user' || eid, '{RDF_TYPE}',
         'iri', '{KG}EntityLink', NULL, NULL FROM user_links
  UNION ALL
  SELECT 'iri', '{KG}link/' || conv_id || '/user' || eid, '{KG}inConv',
         'iri', '{KG}conv/' || conv_id, NULL, NULL FROM user_links
  UNION ALL
  SELECT 'iri', '{KG}link/' || conv_id || '/user' || eid, '{KG}ofEntity',
         'iri', '{KG}user/' || eid, NULL, NULL FROM user_links
  UNION ALL
  SELECT 'iri', '{KG}link/' || conv_id || '/user' || eid, '{KG}mentionCount',
         'literal', CAST(n AS VARCHAR), '{XSD_INTEGER}', NULL FROM user_links
  UNION ALL
  SELECT 'iri', '{KG}link/' || conv_id || '/item' || eid, '{RDF_TYPE}',
         'iri', '{KG}EntityLink', NULL, NULL FROM item_links
  UNION ALL
  SELECT 'iri', '{KG}link/' || conv_id || '/item' || eid, '{KG}inConv',
         'iri', '{KG}conv/' || conv_id, NULL, NULL FROM item_links
  UNION ALL
  SELECT 'iri', '{KG}link/' || conv_id || '/item' || eid, '{KG}ofEntity',
         'iri', '{KG}item/' || eid, NULL, NULL FROM item_links
  UNION ALL
  SELECT 'iri', '{KG}link/' || conv_id || '/item' || eid, '{KG}mentionCount',
         'literal', CAST(n AS VARCHAR), '{XSD_INTEGER}', NULL FROM item_links
)
"""

INDEX_PAIRS_CTE = f"""
index_pairs AS (
  SELECT DISTINCT '<' || s_value || '>' AS subject_key,
         '<' || o_value || '>' AS type_iri
  FROM triples WHERE predicate = '{RDF_TYPE}'
)
"""

# Default flagship rules (plans/pipeline.py DEFAULT_RULES_YAML), expanded:
#   of_type {<KG User>}, on_predicate {<KG hasText>},
#   on_type_predicate {<KG Turn>: [<KG hasRole>]}
MASKED_CTE = f"""
masked AS (
  SELECT t.*,
    (t.s_kind = 'iri' AND EXISTS (
       SELECT 1 FROM index_pairs i
       WHERE i.subject_key = '<' || t.s_value || '>'
         AND i.type_iri = '<{KG}User>')) AS mask_subject,
    ((t.o_kind = 'iri' AND EXISTS (
       SELECT 1 FROM index_pairs i
       WHERE i.subject_key = '<' || t.o_value || '>'
         AND i.type_iri = '<{KG}User>'))
     OR t.predicate = '{KG}hasText'
     OR (t.predicate = '{KG}hasRole' AND EXISTS (
       SELECT 1 FROM index_pairs i
       WHERE i.subject_key = '<' || t.s_value || '>'
         AND i.type_iri = '<{KG}Turn>'))) AS mask_object
  FROM triples t
)
"""


def pseudo_cte(salt: str) -> str:
    return f"""
pseudo AS (
  SELECT
    s_kind,
    CASE WHEN mask_subject AND s_kind = 'iri'
         THEN regexp_extract(s_value, '^(.*[#/])', 1) || sha256('{salt}' || s_value)
         ELSE s_value END AS s_value,
    predicate,
    o_kind,
    CASE WHEN mask_object AND o_kind = 'iri'
         THEN regexp_extract(o_value, '^(.*[#/])', 1) || sha256('{salt}' || o_value)
         WHEN mask_object AND o_kind = 'literal'
         THEN sha256('{salt}' || o_value)
         ELSE o_value END AS o_value,
    CASE WHEN mask_object AND o_kind = 'literal' THEN NULL
         ELSE o_datatype END AS o_datatype,
    CASE WHEN mask_object AND o_kind = 'literal' THEN NULL
         ELSE o_lang END AS o_lang
  FROM masked
)
"""


# Canonical N-Triples line serialization (functions/terms.py) in SQL.
NTRIPLES_LINE_SQL = """
  CASE WHEN s_kind = 'iri' THEN '<' || s_value || '>' ELSE '_:' || s_value END
  || ' <' || predicate || '> ' ||
  CASE
    WHEN o_kind = 'iri' THEN '<' || o_value || '>'
    WHEN o_kind = 'blank' THEN '_:' || o_value
    ELSE
      '"' || replace(replace(replace(replace(o_value,
          chr(92), chr(92) || chr(92)),
          '"', chr(92) || '"'),
          chr(10), chr(92) || 'n'),
          chr(13), chr(92) || 'r') || '"'
      || CASE WHEN o_lang IS NOT NULL THEN '@' || o_lang
              WHEN o_datatype IS NOT NULL THEN '^^<' || o_datatype || '>'
              ELSE '' END
  END || ' .'
"""


_CONV_STATS_SELECT = """
SELECT conv_id,
  count(*) AS n_turns,
  count(DISTINCT role) AS n_roles,
  count(tool) AS n_tool_turns,
  CAST(sum(length(text)) AS BIGINT) AS total_chars,
  max(turn_idx) AS max_turn_idx,
  CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_user_turns,
  CAST((1000000 * sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END))
       // count(*) AS BIGINT) AS user_frac_ppm
FROM transcripts
GROUP BY conv_id
"""


def q_conversation_stats() -> str:
    return f"WITH {TRANSCRIPTS_CTE.strip()} {_CONV_STATS_SELECT}"


def q_filter_conversations(predicate: str | None = None) -> str:
    """Transcript rows of conversations passing the curation predicate
    — same projection as q_transcripts, semi-filtered on the stats
    subquery (operators/extract.py::filter_conversations)."""
    from ..operators.extract import GATE_CONV_PREDICATE

    pred = predicate or GATE_CONV_PREDICATE
    return f"""
WITH {TRANSCRIPTS_CTE.strip()}
SELECT conv_id, turn_idx, role, text, tool,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
FROM transcripts
WHERE conv_id IN (
  SELECT conv_id FROM ({_CONV_STATS_SELECT}) WHERE {pred}
)
"""


def q_transcripts() -> str:
    return f"WITH {TRANSCRIPTS_CTE.strip()} " + (
        "SELECT conv_id, turn_idx, role, text, tool, "
        "strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str FROM transcripts"
    )


def _with_triples(tail: str) -> str:
    return (
        "WITH "
        + TRANSCRIPTS_CTE.strip().rstrip()
        + ", "
        + TRIPLES_CTE.strip()
        + " "
        + tail
    )


def q_extract_triples() -> str:
    return _with_triples(
        "SELECT DISTINCT s_kind, s_value, predicate, o_kind, o_value, o_datatype, o_lang FROM triples"
    )


def q_type_index_pairs() -> str:
    return _with_triples(
        ", " + INDEX_PAIRS_CTE.strip() + " SELECT subject_key, type_iri FROM index_pairs"
    )


def q_type_index_sizes() -> str:
    return _with_triples(
        ", " + INDEX_PAIRS_CTE.strip()
        + " SELECT subject_key, CAST(COUNT(*) AS BIGINT) AS n_types"
        " FROM index_pairs GROUP BY subject_key"
    )


def q_masked_triples() -> str:
    return _with_triples(
        ", " + INDEX_PAIRS_CTE.strip() + ", " + MASKED_CTE.strip()
        + " SELECT DISTINCT s_kind, s_value, predicate, o_kind, o_value,"
        " o_datatype, o_lang, mask_subject, mask_object FROM masked"
    )


def q_masked_triples_inverted() -> str:
    """`invert: true` (rules.rs:158-163) — the YAML's only combinator:
    both masks negated."""
    return _with_triples(
        ", " + INDEX_PAIRS_CTE.strip() + ", " + MASKED_CTE.strip()
        + " SELECT DISTINCT s_kind, s_value, predicate, o_kind, o_value,"
        " o_datatype, o_lang, NOT mask_subject AS mask_subject,"
        " NOT mask_object AS mask_object FROM masked"
    )


def q_pseudo_triples() -> str:
    salt = bench_salt()
    return _with_triples(
        ", " + INDEX_PAIRS_CTE.strip() + ", " + MASKED_CTE.strip()
        + ", " + pseudo_cte(salt).strip()
        + " SELECT DISTINCT s_kind, s_value, predicate, o_kind, o_value,"
        " o_datatype, o_lang FROM pseudo"
    )


def q_ntriples_lines() -> str:
    salt = bench_salt()
    return _with_triples(
        ", " + INDEX_PAIRS_CTE.strip() + ", " + MASKED_CTE.strip()
        + ", " + pseudo_cte(salt).strip()
        + f" SELECT DISTINCT {NTRIPLES_LINE_SQL} AS line FROM pseudo"
    )


def q_entity_links() -> str:
    return f"""
WITH {TRANSCRIPTS_CTE.strip()},
user_mentions AS (
  SELECT conv_id, unnest(regexp_extract_all(text, '@user(\\d+)', 1)) AS eid
  FROM transcripts
)
SELECT conv_id, eid AS entity_id, CAST(COUNT(*) AS BIGINT) AS mention_count
FROM user_mentions GROUP BY conv_id, eid
"""
