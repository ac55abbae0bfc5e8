"""Suite entries for the conversation / SFT data-prep operators
(operators/chat.py): planted chat corpora derived deterministically from
the documents table so DuckDB can replay structure, spans and pairing
exactly.

Planted conversation shape (same arithmetic in both engines):
  conv_id = doc_id // 5, turn = doc_id % 5 (5-turn conversations),
  a conversation opens with a `system` turn when conv_id % 3 = 0,
  then roles alternate user/assistant starting at user; conversations
  with conv_id % 7 = 2 get turn 3 overridden to `user`, planting a
  strict-alternation violation wherever turn 3 was expected to be
  `assistant`. Content is the document text, so char/token volumes are
  real data, not constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purescript_ifrit_spark.sources.tables import load_table
from purescript_ifrit_spark.suite._fixtures import _NORM_SQL
from purescript_ifrit_spark.suite._registry import register

_NTOK_SQL = (
    f"CASE WHEN length({_NORM_SQL}) = 0 THEN 0 "
    f"ELSE len(string_split({_NORM_SQL}, ' ')) END"
)

# the planted-role CASE, shared by all three oracles (DuckDB form)
_ROLE_SQL = (
    "CASE WHEN (doc_id // 5) % 3 = 0 AND doc_id % 5 = 0 THEN 'system' "
    "WHEN (doc_id // 5) % 7 = 2 AND doc_id % 5 = 3 THEN 'user' "
    "WHEN ((doc_id % 5) - CASE WHEN (doc_id // 5) % 3 = 0 THEN 1 ELSE 0 "
    "END) % 2 = 0 THEN 'user' ELSE 'assistant' END"
)

_MSGS_SQL = (
    "SELECT doc_id // 5 AS conv_id, doc_id % 5 AS turn, "
    f"{_ROLE_SQL} AS role, text AS content FROM documents"
)


def _planted_msgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _MSGS_SQL (same arithmetic, Column form)."""
    d = load_table(spark, sf_dir, "documents")
    conv = F.expr("doc_id div 5")  # integer div, no double round-trip
    turn = F.col("doc_id") % 5
    has_sys = conv % 3 == 0
    e = turn - F.when(has_sys, 1).otherwise(0)
    role = (
        F.when(has_sys & (turn == 0), F.lit("system"))
        .when((conv % 7 == 2) & (turn == 3), F.lit("user"))
        .when(e % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    return d.select(
        conv.alias("conv_id"),
        turn.alias("turn"),
        role.alias("role"),
        F.col("text").alias("content"),
    )


def _chat_stats_oracle() -> str:
    # expected-role replay: hs is planted as conv_id % 3 = 0 (the operator
    # reads it from the data; on the planted corpus the two coincide by
    # construction). bool_and(role = expected) is exactly the operator's
    # "optional system head then strict user/assistant alternation".
    expected = (
        "CASE WHEN hs AND turn = 0 THEN 'system' "
        "WHEN ((turn - CASE WHEN hs THEN 1 ELSE 0 END) % 2) = 0 "
        "THEN 'user' ELSE 'assistant' END"
    )
    return (
        f"WITH m AS ({_MSGS_SQL}), "
        "h AS (SELECT *, (conv_id % 3 = 0) AS hs FROM m) "
        "SELECT conv_id, "
        "CAST(count(*) AS BIGINT) AS n_turns, "
        "CAST(count(*) FILTER (WHERE role = 'system') AS BIGINT) "
        "AS n_system, "
        "CAST(count(*) FILTER (WHERE role = 'user') AS BIGINT) AS n_user, "
        "CAST(count(*) FILTER (WHERE role = 'assistant') AS BIGINT) "
        "AS n_assistant, "
        "arg_min(role, turn) AS first_role, "
        "arg_max(role, turn) AS last_role, "
        "CAST(sum(length(content)) AS BIGINT) AS total_chars, "
        "CAST(coalesce(sum(length(content)) "
        "FILTER (WHERE role = 'assistant'), 0) AS BIGINT) "
        "AS assistant_chars, "
        f"bool_and(role = {expected}) AS alternation_ok "
        "FROM h GROUP BY conv_id"
    )


@register("x_chat_stats", _chat_stats_oracle())
def x_chat_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-format structural validation (operators/chat.
    conversation_stats) on the planted 5-turn corpus: role counts,
    first/last roles, char volumes and the strict-alternation flag —
    the planted conv_id%7=2 override flips alternation_ok exactly where
    turn 3 was expected to be assistant, replayed by the oracle's
    expected-role window. One hash exchange on conv_id."""
    from purescript_ifrit_spark.operators.chat import conversation_stats

    return conversation_stats(_planted_msgs(spark, sf_dir))


def _sft_spans_oracle() -> str:
    return (
        f"WITH m AS (SELECT doc_id // 5 AS conv_id, doc_id % 5 AS turn, "
        f"{_ROLE_SQL} AS role, CAST({_NTOK_SQL} AS BIGINT) AS n_tokens "
        "FROM documents), "
        "s AS (SELECT conv_id, turn, role, n_tokens, "
        "SUM(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn "
        "ROWS UNBOUNDED PRECEDING) AS cum FROM m) "
        "SELECT conv_id, turn, "
        "CAST(cum - n_tokens AS BIGINT) AS span_start, "
        "CAST(cum AS BIGINT) AS span_end, n_tokens "
        "FROM s WHERE role = 'assistant'"
    )


@register("x_sft_spans", _sft_spans_oracle())
def x_sft_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT loss-mask spans (operators/chat.sft_loss_spans): token-offset
    [start, end) of every assistant turn in its conversation's
    concatenated token stream — cumulative whitespace-token counts
    (the engine-wide token identity) replayed by the oracle's window
    sum. One window exchange on conv_id."""
    from purescript_ifrit_spark.operators.chat import sft_loss_spans

    return sft_loss_spans(_planted_msgs(spark, sf_dir))


def _pref_pairs_oracle() -> str:
    ord_ = "(((doc_id * 37 + 11) % 101) * 1048576 - doc_id)"
    return (
        "WITH c AS (SELECT doc_id // 2 AS prompt_id, doc_id AS cand_id, "
        "(doc_id * 37 + 11) % 101 AS score, "
        f"CAST({_NTOK_SQL} AS BIGINT) AS ntok, {ord_} AS ord FROM documents) "
        "SELECT prompt_id, "
        "CAST(arg_max(cand_id, ord) AS BIGINT) AS chosen_id, "
        "CAST(arg_min(cand_id, ord) AS BIGINT) AS rejected_id, "
        "arg_max(ntok, ord) AS chosen_tokens, "
        "arg_min(ntok, ord) AS rejected_tokens, "
        "arg_max(ntok, ord) - arg_min(ntok, ord) AS len_gap, "
        "CAST(max(score) - min(score) AS BIGINT) AS score_gap "
        "FROM c GROUP BY prompt_id HAVING count(*) >= 2"
    )


@register("x_preference_pairs", _pref_pairs_oracle())
def x_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair assembly (operators/chat.preference_pairs) on
    planted 2-candidate prompts (prompt_id = doc_id//2, integer score
    (doc_id·37+11) mod 101): winner/loser ids, token lengths and the
    length-bias gap, all integer-exact via the score·2^20 − cand_id
    ordering key the oracle replays with arg_max/arg_min. One hash
    exchange, no join."""
    from purescript_ifrit_spark.operators.chat import preference_pairs

    d = load_table(spark, sf_dir, "documents")
    cands = d.select(
        F.expr("doc_id div 2").alias("prompt_id"),
        F.col("doc_id").alias("cand_id"),
        ((F.col("doc_id") * 37 + 11) % 101).alias("score"),
        F.col("text").alias("content"),
    )
    return preference_pairs(cands)


_TRUNC_BUDGET = 60


def _chat_truncate_oracle() -> str:
    return (
        f"WITH m AS (SELECT doc_id // 5 AS conv_id, doc_id % 5 AS turn, "
        f"{_ROLE_SQL} AS role, CAST({_NTOK_SQL} AS BIGINT) AS n_tokens "
        "FROM documents), "
        "w AS (SELECT *, "
        "SUM(CASE WHEN role <> 'system' THEN n_tokens ELSE 0 END) "
        "OVER (PARTITION BY conv_id ORDER BY turn DESC "
        "ROWS UNBOUNDED PRECEDING) AS sfx, "
        "SUM(CASE WHEN role = 'system' THEN n_tokens ELSE 0 END) "
        "OVER (PARTITION BY conv_id) AS systot FROM m) "
        "SELECT conv_id, turn, role, n_tokens, "
        f"(role = 'system' OR sfx <= {_TRUNC_BUDGET} - systot) AS kept "
        "FROM w"
    )


@register("x_chat_truncate", _chat_truncate_oracle())
def x_chat_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation (operators/chat.truncate_conversation):
    system turns always survive, then the longest suffix of recent
    turns fitting the residual token budget — suffix window sums
    replayed exactly by the oracle on the planted 5-turn corpus (budget
    60 lands mid-conversation for most documents, so both kept and
    dropped turns appear)."""
    from purescript_ifrit_spark.operators.chat import truncate_conversation

    return truncate_conversation(_planted_msgs(spark, sf_dir), _TRUNC_BUDGET)
