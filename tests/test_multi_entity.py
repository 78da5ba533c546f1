"""Multi-entity FK-guarded replay (F4) vs a scalar python oracle."""

import hashlib

import pytest

from agr_loader_spark.entities import (
    NEGATION_FLIPS,
    MultiEntityRunner,
    create_entity_tables,
    generate_entity_log,
)

US, RS = "\x1f", "\x1e"


def _key(object_id, assoc, do_id, withs):
    parts = [object_id or "", assoc or "", do_id or "", RS.join(sorted(withs or []))]
    return hashlib.sha256(US.join(parts).encode()).hexdigest()


def _oracle(events):
    genes, alleles, diseases = {}, {}, {}
    by_epoch = {}
    for r in events:
        by_epoch.setdefault(r["epoch"], []).append(r)
    for e in sorted(by_epoch):
        ep = sorted(by_epoch[e], key=lambda r: r["event_lsn"])

        def lww(rows, keyf):
            last = {}
            for r in rows:
                last[keyf(r)] = r
            return last

        # gene stage
        for k, r in lww([r for r in ep if r["entity"] == "gene"],
                        lambda r: r["primary_id"]).items():
            if r["op"] == "D":
                genes.pop(k, None)
            else:
                genes[k] = {
                    "primary_id": r["primary_id"], "symbol": r["symbol"],
                    "taxon_id": r["taxon_id"], "so_term_id": r["so_term_id"],
                    "synonyms": r["synonyms"], "tokens": r["tokens"],
                }
        # allele stage (FK gene_id -> gene, nulls pass)
        for k, r in lww([r for r in ep if r["entity"] == "allele"],
                        lambda r: r["primary_id"]).items():
            if r["op"] == "D":
                alleles.pop(k, None)
            elif r["gene_id"] is None or r["gene_id"] in genes:
                alleles[k] = {
                    "primary_id": r["primary_id"], "symbol": r["symbol"],
                    "gene_id": r["gene_id"], "taxon_id": r["taxon_id"],
                    "tokens": r["tokens"],
                }
        # disease stage (FK object_id -> gene ∪ allele)
        for k, r in lww([r for r in ep if r["entity"] == "disease_annotation"],
                        lambda r: _key(r["object_id"], r["association_type"],
                                       r["do_id"], r["with_genes"])).items():
            if r["op"] == "D":
                diseases.pop(k, None)
            elif r["object_id"] in genes or r["object_id"] in alleles:
                assoc = r["association_type"]
                if r["negation"]:
                    assoc = NEGATION_FLIPS.get(assoc, assoc)
                diseases[k] = {
                    "annotation_key": k, "object_id": r["object_id"],
                    "object_type": r["object_type"], "do_id": r["do_id"],
                    "association_type": assoc, "negation": r["negation"],
                    "evidence_codes": r["evidence_codes"],
                    "publication_id": r["publication_id"],
                    "with_genes": r["with_genes"], "tokens": r["tokens"],
                }
    return genes, alleles, diseases


@pytest.fixture(scope="module")
def log(spark):
    df = generate_entity_log(spark, n_events=4000, epoch_size=800, seed=11)
    return df, [r.asDict() for r in df.collect()]


def _cmp(table_df, oracle_dict, key):
    got = {r[key]: r.asDict() for r in table_df.collect()}
    assert set(got) == set(oracle_dict)
    for k, exp in oracle_dict.items():
        g = got[k]
        for col, v in exp.items():
            gv = g[col]
            if isinstance(v, list) or isinstance(gv, list):
                assert (gv or []) == (v or []), (k, col)
            else:
                assert gv == v, (k, col, gv, v)


def test_multi_entity_replay_matches_oracle(spark, tmproot, log):
    df, rows = log
    tables = create_entity_tables(spark, tmproot + "/lake")
    runner = MultiEntityRunner(spark, tables, df)
    metrics = runner.run()
    genes, alleles, diseases = _oracle(rows)
    _cmp(tables["gene"].read(), genes, "primary_id")
    _cmp(tables["allele"].read(), alleles, "primary_id")
    _cmp(tables["disease_annotation"].read(), diseases, "annotation_key")
    # FK rejects were observed and counted
    rej = sum(m.get("n_fk_rejected", 0) for m in metrics)
    assert rej > 0
    # idempotent rerun
    m2 = MultiEntityRunner(spark, tables, df).run()
    assert all(m.get("skipped") for m in m2)
