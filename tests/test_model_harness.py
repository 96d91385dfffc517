"""Model-UDF harness: executor-local singleton, fixed-batch accumulation
across Arrow record batches, pad-by-repeat, and the staged detect path.

Reference semantics being pinned: layout_predictor_gpu.py:21 (init lock),
:92-137 (guarded lazy load), :267-275 (FIXED_BS chunks, pad-by-repeat),
:289-292 (slice padding from results)."""

import uuid

from pyspark.sql import functions as F, types as T

from high_performance_docling_spark.operators.model_harness import (
    FixedBatcher,
    ModelSpec,
    arrow_model_stage,
    get_model,
)


class CountingModel:
    def __init__(self):
        self.instance_id = uuid.uuid4().hex
        self.calls = 0

    def forward(self, items):
        self.calls += 1
        return [
            {"v": it, "call_no": self.calls, "batch_len": len(items),
             "instance": self.instance_id}
            for it in items
        ]


def _spec(batch_size=32, pad=True):
    return ModelSpec(
        name=f"counting-{uuid.uuid4().hex}",
        loader=CountingModel,
        batch_size=batch_size,
        pad_by_repeat=pad,
    )


def test_singleton_loader_called_once():
    spec = _spec()
    m1 = get_model(spec)
    m2 = get_model(spec)
    assert m1 is m2


def test_fixed_batcher_one_forward_per_32_items_with_padding():
    spec = _spec(batch_size=32, pad=True)
    batcher = FixedBatcher(spec, CountingModel.forward)
    results = batcher.run(list(range(70)))
    assert [r["v"] for r in results] == list(range(70))  # order + no padding leak
    assert batcher.n_forward_calls == 3  # ceil(70/32)
    # every model call saw EXACTLY batch_size items (tail padded)
    assert {r["batch_len"] for r in results} == {32}
    # items 64..69 rode the padded third call
    assert results[69]["call_no"] == 3


def test_fixed_batcher_no_padding_mode():
    spec = _spec(batch_size=32, pad=False)
    batcher = FixedBatcher(spec, CountingModel.forward)
    results = batcher.run(list(range(70)))
    assert batcher.n_forward_calls == 3
    assert results[69]["batch_len"] == 6  # real tail size, no padding


def test_arrow_model_stage_batches_across_record_batches(spark):
    # 70 rows in ONE partition, tiny Arrow batches (10 rows) so the harness
    # must accumulate ACROSS record batches to fill 32-item model calls
    # class defined LOCALLY so cloudpickle ships it by value to workers
    class LocalCountingModel:
        def __init__(self):
            self.instance_id = uuid.uuid4().hex
            self.calls = 0

        def forward(self, items):
            self.calls += 1
            return [
                {"v": it, "call_no": self.calls, "batch_len": len(items),
                 "instance": self.instance_id}
                for it in items
            ]

    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        df = spark.range(70).select(F.col("id").cast("int")).repartition(1)
        out_schema = T.StructType([
            T.StructField("id", T.IntegerType()),
            T.StructField("call_no", T.IntegerType()),
            T.StructField("batch_len", T.IntegerType()),
            T.StructField("instance", T.StringType()),
        ])
        spec = ModelSpec(
            name=f"counting-{uuid.uuid4().hex}",
            loader=LocalCountingModel,
            batch_size=32,
            pad_by_repeat=True,
        )
        out = arrow_model_stage(
            df,
            spec,
            item_fn=lambda row: row["id"],
            forward=lambda m, items: m.forward(items),
            result_fn=lambda row, res: {
                "id": row["id"], "call_no": res["call_no"],
                "batch_len": res["batch_len"], "instance": res["instance"],
            },
            out_schema=out_schema,
        ).collect()
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert sorted(r["id"] for r in out) == list(range(70))
    # one forward per <=32 items: exactly 3 calls, all full-size (padded)
    assert {r["call_no"] for r in out} == {1, 2, 3}
    assert {r["batch_len"] for r in out} == {32}
    # single executor-local model instance served the whole partition
    assert len({r["instance"] for r in out}) == 1


def test_detect_stage_equals_inline_detection(spark):
    from high_performance_docling_spark.corpus import GenConfig
    from high_performance_docling_spark.operators.stages import (
        detect_stage,
        parse_stage,
    )
    from high_performance_docling_spark.pipeline import docs_dataframe

    cfg = GenConfig(seed=7, n_docs=12)
    docs = docs_dataframe(spark, cfg, num_partitions=4)
    inline = parse_stage(docs, cfg).collect()
    staged = detect_stage(parse_stage(docs, cfg, with_detections=False), cfg).collect()
    key = lambda r: (r["doc_id"], r["page_no"])  # noqa: E731
    inline_map = {key(r): r["detections"] for r in inline}
    staged_map = {key(r): r["detections"] for r in staged}
    assert staged_map == inline_map and len(staged_map) > 0
