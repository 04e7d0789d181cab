"""Lookup enrichment — the heart of jdbc_static / jdbc_streaming.

Reference behavior being reproduced (verified against
/root/reference/lib/logstash/filters/jdbc/lookup.rb:92-109 and
/root/reference/lib/logstash/filters/jdbc_streaming.rb:125-138):

jdbc_static ``Lookup#enhance`` per event:
- parameters invalid (field missing) or SQL error → ``tag_on_failure``
  tags, target NOT set, lookup unsuccessful (→ blocks filter_matched);
- valid + empty result + default configured → ``tag_on_default_use``
  tags, target = [default_hash], successful;
- valid + empty result, no default → target = [] (empty array), successful;
- valid + rows → target = array of row-hashes, successful.
``filter_matched`` fires only when ALL lookups succeeded
(jdbc_static.rb:161-164, lookup_processor.rb:46-48).

jdbc_streaming ``filter`` per event:
- failure → ``tag_on_failure`` AND (payload empty) ``tag_on_default_use``
  + target = [default_hash]; target is ALWAYS set; filter_matched always.

Spark-first design — why there is no cache and no per-event loop:
the LRU+TTL cache (plugin_mixins/jdbc_streaming.rb:7-15) exists to dedup
repeated key probes; a broadcast hash join probes an executor-local hash
table per row, which *is* that cache with zero eviction policy needed.
The Derby index (db_object.rb:19) is the broadcast hash table. TTL/reload
semantics surface as re-broadcast between batches (DimensionLoader.refresh).

Physical shape: the dimension side is pre-aggregated to
``key → array<struct>`` (one row per key) and broadcast, so the fact side
needs NO shuffle and NO fact-side groupBy — at 100 TB the enrich stage is
a map-only stage. Non-equi (LIKE/theta) lookups fall back to a broadcast
nested-loop join + fact-key re-aggregation (documented slow path; prefer
rewriting prefix-LIKE as an equi key).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logstash_integration_jdbc_spark.functions.interpolate import param_expr

TAGS_COL = "tags"
OK_COL = "__lookups_ok"


def _ensure_tags(df: DataFrame) -> DataFrame:
    if TAGS_COL not in df.columns:
        df = df.withColumn(TAGS_COL, F.array().cast("array<string>"))
    return df


def add_tags(df: DataFrame, cond: Column, tags: Sequence[str]) -> DataFrame:
    """Append tags where cond holds (set semantics, like Event#tag)."""
    if not tags:
        return df
    df = _ensure_tags(df)
    tagged = F.array_union(F.coalesce(F.col(TAGS_COL), F.array().cast("array<string>")),
                           F.array(*[F.lit(t) for t in tags]))
    return df.withColumn(TAGS_COL, F.when(cond, tagged).otherwise(F.col(TAGS_COL)))


@dataclass
class Lookup:
    """One lookup: conceptually ``SELECT <select> FROM dim WHERE <on>``.

    ``on`` is a list of ``(dim_column, op, parameter_name)`` with op in
    {'=', 'like'}; ``parameters`` maps parameter name → scheme (field ref
    ``"[f]"``, interpolation ``"%{[f]}"``, or constant).
    """

    id: str
    dim: DataFrame
    on: list[tuple[str, str, str]]
    parameters: dict[str, Any]
    select: list[str] | None = None
    target: str | None = None
    default_hash: dict[str, Any] | None = None
    tag_on_failure: list[str] = dc_field(default_factory=list)
    tag_on_default_use: list[str] = dc_field(default_factory=list)

    def __post_init__(self) -> None:
        if self.target is None:
            # reference: lookup id doubles as target when target omitted
            # (lookup.rb "id_used_as_target").
            self.target = self.id
        if self.select is None:
            keys = {c for c, _, _ in self.on}
            self.select = [c for c in self.dim.columns if c not in keys]
        for _, op, _ in self.on:
            if op not in ("=", "like"):
                raise ValueError(f"lookup {self.id!r}: unsupported op {op!r}")

    # -- compiled pieces ---------------------------------------------------
    def _key_exprs(self) -> tuple[dict[str, Column], Column]:
        """parameter name → key expr, plus combined invalid predicate."""
        keys: dict[str, Column] = {}
        invalid: Column = F.lit(False)
        for name, scheme in self.parameters.items():
            expr, inv = param_expr(scheme)
            keys[name] = expr
            if inv is not None:
                invalid = invalid | inv
        return keys, invalid

    def _payload_fields(self) -> list[str]:
        extra = [k for k in (self.default_hash or {}) if k not in self.select]
        return list(self.select) + extra

    def _default_array(self) -> Column:
        """[default_hash] as array<struct> matching the payload shape."""
        fields = self._payload_fields()
        dh = self.default_hash or {}
        dim_types = dict(self.dim.dtypes)
        cols = []
        for f_ in fields:
            if f_ in dh:
                cols.append(F.lit(dh[f_]).alias(f_))
            else:
                cols.append(F.lit(None).cast(dim_types.get(f_, "string")).alias(f_))
        return F.array(F.struct(*cols))

    def _payload_struct(self) -> Column:
        """dim row → payload struct (default-only fields null)."""
        fields = self._payload_fields()
        dh = self.default_hash or {}
        cols = []
        for f_ in fields:
            if f_ in self.select:
                cols.append(F.col(f_).alias(f_))
            else:
                # default-only key: type it like the default value
                cols.append(F.lit(None).cast(_lit_type(dh[f_])).alias(f_))
        return F.struct(*cols)

    # -- application -------------------------------------------------------
    def apply(self, fact: DataFrame, static_semantics: bool = True,
              fact_key: Sequence[str] | None = None) -> DataFrame:
        """Enrich ``fact`` with this lookup's target/tags/success columns."""
        fact = _ensure_tags(fact)
        if OK_COL not in fact.columns:
            fact = fact.withColumn(OK_COL, F.lit(True))
        keys, invalid = self._key_exprs()

        all_equi = all(op == "=" for _, op, _ in self.on)
        if all_equi:
            joined = self._apply_equi(fact, keys)
        else:
            joined = self._apply_theta(fact, keys, fact_key)

        payload = F.col("__payload")
        found = payload.isNotNull() & (F.size(payload) > 0)
        empty = payload.isNull() | (F.size(payload) == 0)
        use_default = self.default_hash is not None

        if static_semantics:
            # invalid → failure tag, NULL target, lookup failed
            target_col = (
                F.when(invalid, F.lit(None).cast(_array_struct_type_of(joined, "__payload")))
                .when(found, payload)
                .otherwise(self._default_array() if use_default
                           else F.coalesce(payload, F.array().cast(_array_struct_type_of(joined, "__payload"))))
            )
            out = joined.withColumn(self.target, target_col)
            out = add_tags(out, invalid, self.tag_on_failure)
            out = add_tags(out, ~invalid & empty & F.lit(use_default), self.tag_on_default_use)
            out = out.withColumn(OK_COL, F.col(OK_COL) & ~invalid)
        else:
            # jdbc_streaming: failure (≡ invalid here) tags failure AND,
            # being empty, tags default and substitutes the default array;
            # the target is always set; matched regardless.
            target_col = F.when(found & ~invalid, payload).otherwise(self._default_array())
            out = joined.withColumn(self.target, target_col)
            out = add_tags(out, invalid, self.tag_on_failure)
            out = add_tags(out, invalid | empty, self.tag_on_default_use)
        return out.drop("__payload")

    def _payload_array_type(self) -> T.ArrayType:
        """array<struct> type of the target, from schema only (usable even
        when the dimension's data is unavailable)."""
        dim_fields = {f.name: f.dataType for f in self.dim.schema.fields}
        dh = self.default_hash or {}
        fields = []
        for f_ in self._payload_fields():
            if f_ in dim_fields:
                fields.append(T.StructField(f_, dim_fields[f_]))
            else:
                fields.append(T.StructField(f_, _LIT_TYPES[_lit_type(dh.get(f_))]))
        # containsNull=False matches collect_list's output type, so
        # degraded and healthy batches stay schema-identical
        return T.ArrayType(T.StructType(fields), containsNull=False)

    def apply_failed(self, fact: DataFrame, static_semantics: bool = True) -> DataFrame:
        """Batch-scoped SQL-error path — the dimension was unavailable.

        The reference caches *failed* per-key probes (negative cache,
        jdbc_streaming/statement_handler.rb:40-56) and tags
        ``tag_on_failure`` on SQL errors; jdbc_static marks the lookup
        unsuccessful on SQL error (lookup.rb:92-109). The columnar batch
        equivalent: ONE load attempt per batch (the broadcast build *is*
        the cache; its failure is the negative entry), after which every
        row takes the failure treatment without further probing:

        - static: failure tags, target NOT set (null), gate false;
        - streaming: failure tags AND — payload being empty — default
          tags + default target; target always set, matched regardless.
        """
        fact = _ensure_tags(fact)
        if OK_COL not in fact.columns:
            fact = fact.withColumn(OK_COL, F.lit(True))
        atype = self._payload_array_type()
        if static_semantics:
            out = fact.withColumn(self.target, F.lit(None).cast(atype))
            out = add_tags(out, F.lit(True), self.tag_on_failure)
            return out.withColumn(OK_COL, F.lit(False))
        target = (self._default_array() if self.default_hash is not None
                  else F.array().cast(atype))
        out = fact.withColumn(self.target, target)
        out = add_tags(out, F.lit(True), self.tag_on_failure)
        return add_tags(out, F.lit(True), self.tag_on_default_use)

    def _apply_equi(self, fact: DataFrame, keys: dict[str, Column]) -> DataFrame:
        # Pre-aggregate the dim to one row per key → the broadcast hash
        # table IS the lookup index; left join is map-only on the fact.
        key_cols = [(dim_col, pname) for dim_col, _, pname in self.on]
        dim_agg = (
            self.dim.groupBy(*[F.col(c).alias(f"__k_{c}") for c, _ in key_cols])
            .agg(F.collect_list(self._payload_struct()).alias("__payload"))
        )
        cond = None
        for dim_col, pname in key_cols:
            c = keys[pname].cast(dict(dim_agg.dtypes)[f"__k_{dim_col}"]) == F.col(f"__k_{dim_col}")
            cond = c if cond is None else (cond & c)
        joined = fact.join(F.broadcast(dim_agg), cond, "left")
        return joined.drop(*[f"__k_{c}" for c, _ in key_cols])

    def _apply_theta(self, fact: DataFrame, keys: dict[str, Column],
                     fact_key: Sequence[str] | None) -> DataFrame:
        """LIKE/theta lookups: broadcast nested-loop + re-aggregate.

        Mirrors ``WHERE ip LIKE :ip`` with interpolated patterns
        (spec/filters/jdbc_static_spec.rb:62-67). Needs a unique fact key
        to reassemble 0..n matches into one array per fact row.
        """
        if not fact_key:
            raise ValueError(
                f"lookup {self.id!r}: non-equi lookup requires fact_key "
                "(unique fact columns) to aggregate matches"
            )
        fact_k = fact.select(*fact_key, *[keys[p].alias(f"__p_{p}") for p in self.parameters])
        cond = None
        for dim_col, op, pname in self.on:
            if op == "=":
                c = F.col(f"__p_{pname}") == self.dim[dim_col]
            else:  # like — pattern comes from the event side
                c = F.like(self.dim[dim_col], F.col(f"__p_{pname}"))
            cond = c if cond is None else (cond & c)
        matches = (
            fact_k.join(F.broadcast(self.dim), cond, "inner")
            .groupBy(*fact_key)
            .agg(F.collect_list(self._payload_struct()).alias("__payload"))
        )
        return fact.join(matches, list(fact_key), "left")


def _lit_type(v: Any) -> str:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "bigint"
    if isinstance(v, float):
        return "double"
    return "string"


_LIT_TYPES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "bigint": T.LongType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
}


def _array_struct_type_of(df: DataFrame, colname: str) -> T.DataType:
    return df.schema[colname].dataType


class LookupProcessor:
    """Apply N lookups in one pass with config validation.

    Mirrors LookupProcessor (lookup_processor.rb:30-98): duplicate lookup
    ids and duplicate/overlapping targets are configuration errors; all
    lookups run against the same broadcast-resident store; the combined
    success gate feeds filter_matched.
    """

    def __init__(self, lookups: Sequence[Lookup]) -> None:
        ids = [lk.id for lk in lookups]
        if len(set(ids)) != len(ids):
            raise ValueError(f"duplicate lookup ids: {sorted(ids)}")
        targets = [lk.target for lk in lookups]
        if len(set(targets)) != len(targets):
            raise ValueError(f"duplicate lookup targets: {sorted(targets)}")
        self.lookups = list(lookups)

    def enhance(self, fact: DataFrame, fact_key: Sequence[str] | None = None,
                failed: Sequence[str] = ()) -> DataFrame:
        """All lookups + ``__lookups_ok`` gate column (filter_matched).

        ``failed`` names lookups whose dimension load failed this batch
        (e.g. a ``LoaderError`` from the count guard): those take the
        SQL-error path (``apply_failed``) instead of joining — the
        batch-scoped negative cache. Typical wiring::

            failed = [lk.id for lk in proc.lookups
                      if not loader_ok(loaders[lk.id])]
            proc.enhance(fact, failed=failed)
        """
        failed_set = set(failed)
        out = fact
        for lk in self.lookups:
            if lk.id in failed_set:
                out = lk.apply_failed(out, static_semantics=True)
            else:
                out = lk.apply(out, static_semantics=True, fact_key=fact_key)
        return out


def streaming_lookup(fact: DataFrame, lookup: Lookup,
                     fact_key: Sequence[str] | None = None,
                     dim_failed: bool = False) -> DataFrame:
    """jdbc_streaming semantics: target always set, default on empty/failure.

    ``dim_failed=True`` is the SQL-error path (negative-cache analog):
    failure + default tags on every row, default target substituted.
    """
    if dim_failed:
        return lookup.apply_failed(fact, static_semantics=False)
    return lookup.apply(fact, static_semantics=False, fact_key=fact_key)
