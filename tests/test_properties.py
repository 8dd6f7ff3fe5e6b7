"""Property-based tests (hypothesis) for the non-standard semantics:
upsert/MERGE invariants and schema-drift reconciliation, over randomly
generated batches rather than hand-picked cases (SURVEY §5)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from the_movies_db_spark.schema_evolution import (
    apply_drift,
    check_schema_drift,
    evolve_schema,
)
from the_movies_db_spark.upsert import merge_upsert

ROW_SCHEMA = "pk long, v string, n double, ord long"

rows = st.lists(
    st.tuples(
        st.integers(0, 9),  # pk: small domain → frequent collisions
        st.sampled_from(["a", "b", "c", None]),
        st.sampled_from([1.0, 2.5, None]),
        st.integers(0, 100),  # ord: keep-latest tie-break input
    ),
    min_size=0,
    max_size=12,
)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, data):
    return spark.createDataFrame(data, ROW_SCHEMA)


@given(target=rows, batch=rows)
@SET
def test_upsert_row_invariants(spark, target, batch):
    # dedupe target pks first (a target table is pk-unique by construction)
    tgt = list({r[0]: r for r in target}.values())
    t = _df(spark, tgt)
    b = _df(spark, batch)
    merged = merge_upsert(t, b, "pk", order_col="ord", audit_col="__none__")
    got = {r.pk: r for r in merged.collect()}

    batch_pks = {r[0] for r in batch}
    tgt_pks = {r[0] for r in tgt}
    # 1. pk-uniqueness is preserved
    assert len(got) == len(tgt_pks | batch_pks)
    # 2. unmatched target rows persist unchanged
    for r in tgt:
        if r[0] not in batch_pks:
            assert (got[r[0]].v, got[r[0]].n, got[r[0]].ord) == (r[1], r[2], r[3])
    # 3. every batch pk exists afterwards
    assert batch_pks <= set(got)
    # 4. for batch-only pks, the surviving row is the max-ord batch row's ord
    for pk in batch_pks - tgt_pks:
        max_ord = max(r[3] for r in batch if r[0] == pk)
        assert got[pk].ord == max_ord


@given(batch=rows)
@SET
def test_upsert_idempotent(spark, batch):
    # upserting the merged result into itself changes nothing
    tgt = list({r[0]: r for r in batch}.values())
    t = _df(spark, tgt)
    merged = merge_upsert(t, t, "pk", order_col="ord", audit_col="__none__")
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, t.collect()))
    assert a == b


names = st.sampled_from(["a", "b", "c", "d", "e"])
types_ = st.sampled_from([LongType(), StringType(), DoubleType()])
schemas = st.dictionaries(names, types_, min_size=1, max_size=5)


@given(dest=schemas, incoming=schemas)
@SET
def test_drift_detection_properties(spark, dest, incoming):
    dest_t = StructType([StructField(n, t) for n, t in sorted(dest.items())])
    inc_t = StructType([StructField(n, t) for n, t in sorted(incoming.items())])
    drift = check_schema_drift(inc_t, dest_t)

    added = {f.name for f in drift.columns_to_add}
    modified = {m.name for m in drift.modified_cols}
    # added ⊆ incoming-only; modified ⊆ shared with a type change
    assert added == set(incoming) - set(dest)
    assert modified == {
        n for n in set(incoming) & set(dest)
        if incoming[n].simpleString() != dest[n].simpleString()
    }

    evolved = evolve_schema(dest_t, drift)
    evolved_names = {f.name for f in evolved.fields}
    # evolution never drops or retypes an existing destination column
    for f in dest_t.fields:
        assert evolved[f.name].dataType == f.dataType
    # every modified column got its suffixed sibling
    for m in drift.modified_cols:
        assert m.renamed_to in evolved_names


doc_texts = st.lists(
    st.text(alphabet="ab c", min_size=1, max_size=30), min_size=2, max_size=8
)


@given(texts=doc_texts)
@SET
def test_minhash_pair_properties(spark, texts):
    from the_movies_db_spark.operators.dedup import minhash_lsh_dedup_pairs

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    pairs = minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", threshold=0.0, num_hashes=4, num_bands=2
    ).collect()
    for r in pairs:
        assert r.id_a < r.id_b            # canonical orientation
        assert 0.0 <= r.jaccard <= 1.0    # jaccard is a proper ratio
    # an exact duplicate ALWAYS surfaces with jaccard 1.0 (all bands equal)
    dup = spark.createDataFrame(
        [(0, texts[0]), (1, texts[0])], "doc_id long, text string"
    )
    got = minhash_lsh_dedup_pairs(
        dup, "doc_id", "text", threshold=0.0, num_hashes=4, num_bands=2
    ).collect()
    assert len(got) == 1 and got[0].jaccard == 1.0
