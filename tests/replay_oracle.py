"""Pure-pandas oracle fold of a change log (FIXTURES.md F3).

Defines expected final state by literally applying the reference's MERGE
semantics one event at a time in lsn order: I/U = last-writer-wins whole
-row upsert (MERGE ... SET, src/etl/allele_etl.py:142-144), D = delete
(src/etl/disease_etl.py:238-248), S = schema mutation applied at its log
position. Deliberately scalar/naive — the point is an implementation as
different as possible from the engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# initial target schema: (column name, src event field)
INITIAL_SCHEMA = [("doc_id", "doc_id"), ("tokens", "tokens"),
                  ("n_tok", "n_tok"), ("source", "source")]


def oracle_fold(events: pd.DataFrame) -> pd.DataFrame:
    ev = events.sort_values("event_lsn", kind="mergesort")
    ev = ev.drop_duplicates(subset=["doc_id", "event_lsn"])
    schema = [list(c) for c in INITIAL_SCHEMA]  # [ [name, src], ... ]
    state: dict[str, dict] = {}
    for row in ev.itertuples(index=False):
        if row.op == "S":
            sc = row.schema_change
            if sc["kind"] == "add":
                schema.append([sc["column"], sc["src_field"]])
            elif sc["kind"] == "rename":
                for c in schema:
                    if c[0] == sc["column"]:
                        c[0] = sc["new_name"]
            elif sc["kind"] == "widen":
                pass  # value-preserving by definition
            elif sc["kind"] == "drop":
                # Iceberg drop is metadata-only but by FIELD ID: a later
                # re-add under the same name is a new field, so already-
                # stored values must not resurrect — purge them now.
                src = next((s for n, s in schema if n == sc["column"]), None)
                schema = [c for c in schema if c[0] != sc["column"]]
                if src:
                    for r in state.values():
                        r.pop(src, None)
        elif row.op == "D":
            state.pop(row.doc_id, None)
        else:  # I / U — whole-row upsert gated by schema-at-event-time
            state[row.doc_id] = {src: getattr(row, src) for _, src in schema if src}
    cols = {name: [] for name, _ in schema}
    for doc_id in sorted(state):
        r = state[doc_id]
        for name, src in schema:
            cols[name].append(r.get(src))
    out = pd.DataFrame(cols)
    if "tokens" in out.columns:
        out["tokens"] = out["tokens"].map(
            lambda a: None if a is None else [int(x) for x in np.asarray(a)]
        )
    return out
