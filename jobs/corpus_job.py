"""spark-submit entrypoint: the training-corpus hygiene chain as ONE job.

The LLM-data cleaning sequence the extension operators exist for, composed
end-to-end over a documents table (the task-brief "large-scale training-data
pipeline"), with every drop counted in the manifest (no silent drops):

    docs (doc_id, text, ...)
      -> quality gate        (Gopher/C4 keep/drop + per-reason counts; map-only)
      -> PII scrub           (email/phone/IP placeholders + removal counts; map-only)
      -> exact dedupe        (md5 fingerprint, keep min id)
      -> near dedupe         (MinHash-LSH, capped hot buckets; --near-dedupe)
      -> decontamination     (n-gram overlap vs --benchmark parquet)
      -> source cap          (keep N longest docs per host/source; --source-cap)
      -> BPE training        (merge table + vocab artifacts; --bpe-merges)
      -> train/val/test split (leak-proof md5 hash split; engine-portable)
      -> packing layout       (GPT-style chunk ids over md5-bucketed streams)
      -> <out>/corpus parquet + <out>/manifest.json

    spark-submit --py-files engine.zip jobs/corpus_job.py \
        --docs /path/documents_parquet --out /path/outdir \
        [--gen-docs 50000 --gen-boiler 5000] [--near-dedupe] \
        [--benchmark /path/bench_parquet] [--source-cap 1000] [--max-len 512]

Stage order is deliberate: the map-only gates run first (cheapest, inside
the scan), content dedupe runs on scrubbed text (mirror copies differing
only in scrubbed PII collapse), decontamination runs on the deduped
survivors (smallest n-gram table), and split/packing are assignment-only
(no rows dropped after the split, so no leakage re-balancing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default=None, help="input documents parquet dir")
    ap.add_argument("--gen-docs", type=int, default=0, help="generate N synthetic docs instead")
    ap.add_argument("--gen-boiler", type=int, default=0, help="of which N are one identical boilerplate doc")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True)
    ap.add_argument("--near-dedupe", action="store_true")
    ap.add_argument("--line-dedupe", action="store_true",
                    help="C4 global line dedup (one surviving occurrence per "
                    "repeated line corpus-wide) before doc-level dedupe; "
                    "docs emptied by it are dropped and counted")
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--min-quality", type=float, default=0.3,
                    help="quality-gate floor (0.75 suits stopword-bearing "
                    "English corpora; the default is permissive)")
    ap.add_argument("--max-dup-ngram-frac", type=float, default=0.2)
    ap.add_argument("--dedupe-threshold", type=float, default=0.8)
    ap.add_argument("--benchmark", default=None, help="decontamination benchmark parquet (text column)")
    ap.add_argument("--source-cap", type=int, default=0,
                    help="keep at most N docs per --source-col (C4-style domain balancing; 0 = off)")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--bpe-merges", type=int, default=0,
                    help="train a BPE tokenizer on the cleaned corpus: write "
                         "<out>/bpe_merges + <out>/bpe_vocab and manifest counts")
    ap.add_argument("--max-len", type=int, default=512)
    ap.add_argument("--pack-buckets", type=int, default=64)
    ap.add_argument("--splits", default="train:0.9,val:0.05,test:0.05")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from engine import datagen
    from engine.operators import dedupe, sampling, textstats
    from engine.operators._pins import pin_scope
    from engine.session import build_session

    spark = build_session(
        app_name="corpus-hygiene", master=args.master, shuffle_partitions=args.partitions
    )
    t0 = time.time()

    if args.docs:
        docs = spark.read.parquet(args.docs)
    else:
        if not args.gen_docs:
            ap.error("need --docs or --gen-docs")
        docs = datagen.generate_boilerplate_docs(
            spark, args.gen_docs, args.gen_boiler, seed=args.seed
        )
    manifest: dict = {"input_docs": docs.count()}

    # 1. quality gate (map-only) — keep survivors, count every reason
    gated = textstats.quality_filter(
        docs,
        min_tokens=args.min_tokens,
        min_quality=args.min_quality,
        max_dup_ngram_frac=args.max_dup_ngram_frac,
    ).persist()
    kept = gated.where("keep").select("doc_id")
    manifest["quality"] = {
        "kept": kept.count(),
        "dropped": gated.where("NOT keep").count(),
        "drop_reasons": {
            r["reasons"]: r["n"]
            for r in gated.where("NOT keep")
            .groupBy("reasons")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        },
    }
    docs = docs.join(kept, "doc_id", "left_semi")
    gated.unpersist()

    # 2. PII scrub (map-only) — text replaced, removals counted then dropped
    scrubbed = textstats.scrub_pii(docs).persist()
    row = scrubbed.agg(
        F.sum("n_emails").alias("e"), F.sum("n_phones").alias("p"), F.sum("n_ips").alias("i")
    ).first()
    manifest["pii_scrub"] = {
        "emails_scrubbed": int(row["e"] or 0),
        "phones_scrubbed": int(row["p"] or 0),
        "ips_scrubbed": int(row["i"] or 0),
    }
    docs = scrubbed.drop("n_emails", "n_phones", "n_ips")

    # 2b. optional C4 global line dedup — BEFORE doc-level dedupe (the C4
    # order); every removed line and every emptied doc is counted
    ld = None
    if args.line_dedupe:
        ld = dedupe.line_dedupe(docs, "doc_id", "text").persist()
        row = ld.agg(
            F.sum("n_lines_kept").alias("k"),
            F.sum("n_lines_dropped").alias("d"),
            F.sum(F.when(F.col("text_clean") == "", 1).otherwise(0)).alias("z"),
        ).first()
        manifest["line_dedupe"] = {
            "lines_kept": int(row["k"] or 0),
            "lines_dropped": int(row["d"] or 0),
            "emptied_docs_dropped": int(row["z"] or 0),
        }
        other = [c for c in docs.columns if c not in ("doc_id", "text")]
        docs = docs.select("doc_id", *other).join(
            ld.filter(F.col("text_clean") != "").select(
                "doc_id", F.col("text_clean").alias("text")
            ),
            "doc_id",
        )

    # 3. exact dedupe on scrubbed text (md5 keys, keep min id)
    docs = dedupe.dedupe_exact_text(docs)
    manifest["exact_dedup_survivors"] = docs.count()
    scrubbed.unpersist()
    if ld is not None:
        ld.unpersist()

    # 4. optional MinHash-LSH near-dedupe (capped; drop counts surfaced)
    if args.near_dedupe:
        dd: dict = {}
        with pin_scope():
            pairs = dedupe.minhash_lsh_dedupe_pairs(
                docs, "doc_id", "text", threshold=args.dedupe_threshold, metrics=dd
            ).persist()
            dd["near_dup_pairs"] = pairs.count()
            docs = dedupe.drop_near_duplicates(docs, pairs).persist()
            dd["survivors"] = docs.count()
            pairs.unpersist()
        manifest["near_dedupe"] = dd

    # 5. optional decontamination vs the benchmark
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark).select("text")
        flags = dedupe.decontaminate(docs, bench)
        clean = flags.where("NOT contaminated").select("doc_id")
        manifest["decontamination"] = {
            "contaminated_dropped": flags.where("contaminated").count(),
            "clean": clean.count(),
        }
        docs = docs.join(clean, "doc_id", "left_semi")

    # 5b. optional per-source cap (C4-style domain balancing)
    if args.source_cap > 0:
        if args.source_col not in docs.columns:
            raise SystemExit(
                f"--source-cap needs column '{args.source_col}' in the input "
                f"docs (have: {docs.columns}); synthetic --gen-docs corpora "
                "carry no source column"
            )
        sc_m: dict = {}
        docs = sampling.cap_per_group(
            docs, args.source_col, args.source_cap,
            order_by=[F.length("text").desc()], metrics=sc_m,
        ).persist()
        sc_m["survivors"] = docs.count()
        manifest["source_cap"] = sc_m

    # 5c. optional BPE tokenizer training on the cleaned corpus: the
    # trained merge table + subword vocab are pipeline artifacts next to
    # the corpus (the tokenizer must be learned AFTER hygiene so boilerplate
    # and contamination don't shape the subword inventory)
    if args.bpe_merges > 0:
        from engine.operators import bpe

        res = bpe.bpe_train(docs, num_merges=args.bpe_merges)
        res.merges.write.mode("overwrite").parquet(
            os.path.join(args.out, "bpe_merges")
        )
        res.vocab.write.mode("overwrite").parquet(os.path.join(args.out, "bpe_vocab"))
        manifest["bpe"] = {
            "merges_learned": res.merges.count(),
            "vocab_size": res.vocab.count(),
        }

    # 6. leak-proof split + 7. packing layout (assignment-only stages)
    splits = {}
    for part in args.splits.split(","):
        label, w = part.split(":")
        splits[label] = float(w)
    final = sampling.hash_split(docs, "doc_id", splits, salt="corpus")
    layout = sampling.pack_sequences(
        docs, max_len=args.max_len, num_buckets=args.pack_buckets
    )
    final = final.join(layout, "doc_id")

    os.makedirs(args.out, exist_ok=True)
    final.write.mode("overwrite").parquet(os.path.join(args.out, "corpus"))
    out = spark.read.parquet(os.path.join(args.out, "corpus"))
    manifest["final_docs"] = out.count()
    manifest["splits"] = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    manifest["packed_chunks"] = out.select("bucket", "chunk_id").distinct().count()
    manifest["total_tokens"] = int(out.agg(F.sum("n_tokens")).first()[0] or 0)
    manifest["wall_sec"] = round(time.time() - t0, 3)
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
