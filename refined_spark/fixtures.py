"""Deterministic synthetic fixtures for the entity-resolution pipeline.

Generates (seeded, no wall-clock, no external data) the input shape mandated
by BASELINE.json input_hint:

    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int>>)

plus the entity-side tables the reference keeps as LMDB/memmap lookups
(SURVEY.md §1.2) re-expressed as relational tables:

    pem(surface_form, candidates array<struct<qcode,prior>>)    # P(e|m)
    entity_meta(qcode, label, description, is_human)
    entity_embeddings(qcode, emb array<float>)
    human_qcodes(qcode)
    gold_mentions(doc_id, mention_id, surface, offset, gold_qcode, block_key)

The corpus deliberately contains:
  - full-name + later-surname mention pairs (exercises person-coref J4,
    reference: candidate_generator.py:55-92),
  - "the X" / accented / possessive surface variants (exercises F1
    normalization, reference: loaders.py:137-148),
  - ambiguous surnames shared by 2+ entities (scoring must discriminate),
  - one HOT alias appearing in ~20% of docs (exercises skew/salting),
  - ~10% kind='media' spans interleaved (must survive byte-identically).

Embeddings are deterministic hashed bag-of-words projections (see
`hash_embed`); mention context embeddings use the same featurizer over the
doc's text, so engine and oracle agree exactly.
"""

from __future__ import annotations

import hashlib
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from refined_spark.functions.normalize import normalize_surface_py

EMB_DIM = 64

FIRST = ["Donald", "Angela", "Boris", "Emmanuel", "Jacinda", "Justin", "Pedro",
         "Olaf", "Rishi", "Giorgia", "Fumio", "Luiz", "Cyril", "Sanna", "Mette"]
LAST = ["Trump", "Merkel", "Johnson", "Macron", "Ardern", "Trudeau", "Sanchez",
        "Scholz", "Sunak", "Meloni", "Kishida", "Lula", "Ramaphosa", "Marin",
        "Frederiksen", "Müller", "García", "Øst"]
ORG = ["England", "Paris FC", "Acme Corp", "United Nations", "Berlin",
       "Rio Grande", "Nile Delta", "Andes Group", "Sahara Fund", "Baltic Union"]
FILLER = ("market shares rose on strong earnings while analysts expected a "
          "slower quarter amid new policy announcements from the central bank "
          "and a series of regional summits").split()


def _token_buckets(tok: str) -> tuple[int, float, int, float]:
    h = hashlib.md5(tok.encode("utf-8")).digest()
    return (
        int.from_bytes(h[:4], "big"),
        1.0 if h[4] % 2 == 0 else -1.0,
        int.from_bytes(h[5:9], "big"),
        0.5 if h[9] % 2 == 0 else -0.5,
    )


def hash_embed(text: str, dim: int = EMB_DIM) -> list[float]:
    """Deterministic hashed bag-of-words embedding, L2-normalized.
    Each token contributes +/-1 to dim buckets chosen by md5."""
    v = np.zeros(dim, dtype=np.float64)
    for tok in text.lower().split():
        i1, s1, i2, s2 = _token_buckets(tok)
        v[i1 % dim] += s1
        v[i2 % dim] += s2
    n = np.linalg.norm(v)
    if n > 0:
        v /= n
    return [float(x) for x in v]


_BUCKET_CACHE: dict[str, tuple[int, float, int, float]] = {}


def hash_embed_batch(texts, dim: int = EMB_DIM, normalize: bool = True) -> np.ndarray:
    """Vectorized batch version of hash_embed: one (len(texts), dim) float64
    matrix. Bit-identical to the scalar version — every token contributes
    only ±1 / ±0.5, so all partial sums are exactly representable and the
    accumulation order is irrelevant. Token bucket hashes are memoized, so
    md5 runs once per DISTINCT token per Python worker, and the scatter-add
    is a single numpy np.add.at over the whole Arrow batch.

    normalize=False returns the raw (unnormalized) token-count vectors.
    Because every element is then a multiple of 0.5 (exactly representable),
    sums and differences of these vectors are EXACT — the window featurizer
    exploits this to build per-mention windows from per-span vectors via
    prefix sums, then applies the same norm as the scalar path."""
    n = len(texts)
    tok_lists = [(t.lower().split() if t else []) for t in texts]
    counts = np.fromiter((len(ts) for ts in tok_lists), dtype=np.int64, count=n)
    total = int(counts.sum())
    out = np.zeros((n, dim), dtype=np.float64)
    if total:
        idx = np.empty(2 * total, dtype=np.int64)
        val = np.empty(2 * total, dtype=np.float64)
        row = np.repeat(np.arange(n, dtype=np.int64), counts) * dim
        cache = _BUCKET_CACHE
        k = 0
        for ts in tok_lists:
            for tok in ts:
                b = cache.get(tok)
                if b is None:
                    b = cache[tok] = _token_buckets(tok)
                idx[k] = b[0] % dim
                val[k] = b[1]
                idx[k + total] = b[2] % dim
                val[k + total] = b[3]
                k += 1
        flat = out.reshape(-1)
        np.add.at(flat, np.concatenate([row + idx[:total], row + idx[total:]]), val)
        if normalize:
            norms = np.linalg.norm(out, axis=1, keepdims=True)
            np.divide(out, norms, out=out, where=norms > 0)
    return out


def build_entities(n_entities: int, rng: random.Random):
    """Entities: ~70% persons (first+last), rest orgs/places. Surnames are
    reused across persons to create ambiguity."""
    entities = []
    for i in range(n_entities):
        qcode = f"Q{i + 1}"
        if i % 10 < 7:
            first = FIRST[i % len(FIRST)]
            last = LAST[(i * 7 + i // len(FIRST)) % len(LAST)]
            label = f"{first} {last}"
            desc = f"{label} politician from district {i}"
            kind = "human"
        else:
            label = ORG[i % len(ORG)] + ("" if i < len(ORG) else f" {i}")
            desc = f"{label} organization sector {i}"
            kind = "org"
        entities.append({"qcode": qcode, "label": label, "description": desc,
                         "is_human": kind == "human", "popularity": rng.random()})
    # make one org the HOT entity with a very popular alias
    for e in entities:
        if not e["is_human"]:
            e["popularity"] = max(e["popularity"], 0.5)
    hot = next(e for e in entities if not e["is_human"])
    hot["popularity"] = 10.0
    return entities, hot


def surface_variants(e: dict) -> list[tuple[str, float]]:
    """(raw surface, relative link weight) pairs per entity."""
    label = e["label"]
    out = [(label, 6.0)]
    if e["is_human"]:
        last = label.split()[-1]
        out.append((last, 2.0))
        out.append((label + "'s", 1.0))
        out.append((label.upper(), 0.5))
    else:
        out.append(("the " + label, 2.0))
        out.append((label + "'s", 1.0))
    return out


def build_pem(entities: list[dict], max_candidates: int = 30):
    """Aggregate link weights per (normalized surface, qcode) -> priors.
    Mirrors generate_pem.py:160-164 semantics: prior = count / sum per
    surface, candidates sorted desc by prior (ties by qcode for determinism),
    truncated to max_candidates."""
    counts: dict[str, dict[str, float]] = {}
    for e in entities:
        for raw, w in surface_variants(e):
            sf = normalize_surface_py(raw)
            if not sf:
                continue
            counts.setdefault(sf, {}).setdefault(e["qcode"], 0.0)
            counts[sf][e["qcode"]] += w * (1.0 + e["popularity"])
    pem = {}
    for sf, m in counts.items():
        tot = sum(m.values())
        cands = sorted(
            ((q, c / tot) for q, c in m.items()),
            key=lambda x: (-x[1], x[0]),
        )[:max_candidates]
        pem[sf] = cands
    return pem


def _media_ref(rng: random.Random) -> str:
    return "img://" + hashlib.md5(str(rng.random()).encode()).hexdigest()[:12]


def generate(out_dir: str, n_docs: int = 200, n_entities: int = 50,
             seed: int = 42, emb_dim: int = EMB_DIM,
             chunk_rows: int = 100_000) -> dict[str, str]:
    """Write all fixture tables as parquet under out_dir; returns paths.
    Documents stream out in chunks so million-doc corpora fit in memory."""
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    entities, hot = build_entities(n_entities, rng)
    pem = build_pem(entities)
    ent_by_q = {e["qcode"]: e for e in entities}

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    docs_schema = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(span_t))])
    docs_writer = pq.ParquetWriter(f"{out_dir}/documents.parquet", docs_schema)

    docs_rows = []
    gold_rows = []

    def flush_docs():
        nonlocal docs_rows
        if docs_rows:
            # small row groups so a Spark scan splits the file into many tasks
            docs_writer.write_table(
                pa.Table.from_pylist(docs_rows, schema=docs_schema),
                row_group_size=2048,
            )
            docs_rows = []

    for d in range(n_docs):
        doc_id = f"doc-{d:06d}"
        spans = []
        offset = 0

        def push(kind, text, media_ref=""):
            nonlocal offset
            spans.append({"kind": kind, "text": text,
                          "media_ref": media_ref, "offset": offset})
            offset += max(len(text), 1) + 1

        # choose 2-4 entities for this doc; hot entity in ~20% of docs
        k = rng.randint(2, 4)
        doc_ents = rng.sample(entities, k)
        if rng.random() < 0.2 and hot not in doc_ents:
            doc_ents[0] = hot

        n_spans = rng.randint(6, 18)
        mention_plan = []
        for e in doc_ents:
            variants = surface_variants(e)
            raw = variants[rng.randrange(len(variants))][0]
            mention_plan.append((e, raw))
            # persons: add a later surname-only mention half the time (coref)
            if e["is_human"] and rng.random() < 0.5:
                mention_plan.append((e, e["label"].split()[-1]))
        rng.shuffle(mention_plan)
        # keep full-name before surname per entity (forward coref shape);
        # backward_coref semantics make order irrelevant, but keep realistic
        mi = 0
        for s in range(n_spans):
            r = rng.random()
            if mi < len(mention_plan) and (r < 0.45 or (n_spans - s) <= (len(mention_plan) - mi)):
                e, raw = mention_plan[mi]
                mi += 1
                push("text", raw)
                gold_rows.append({
                    "doc_id": doc_id,
                    "mention_id": f"{doc_id}#{spans[-1]['offset']}",
                    "surface": raw,
                    "offset": spans[-1]["offset"],
                    "gold_qcode": e["qcode"],
                    "block_key": normalize_surface_py(raw),
                })
            elif r < 0.55:
                push("media", "", _media_ref(rng))
            else:
                t = " ".join(rng.choices(FILLER, k=rng.randint(3, 8)))
                push("text", t)
        docs_rows.append({"doc_id": doc_id, "spans": spans})
        if len(docs_rows) >= chunk_rows:
            flush_docs()

    flush_docs()
    docs_writer.close()

    cand_t = pa.struct([("qcode", pa.string()), ("prior", pa.float64())])
    pem_rows = [{"surface_form": sf,
                 "candidates": [{"qcode": q, "prior": p} for q, p in cands]}
                for sf, cands in sorted(pem.items())]
    pq.write_table(
        pa.Table.from_pylist(pem_rows, schema=pa.schema(
            [("surface_form", pa.string()), ("candidates", pa.list_(cand_t))])),
        f"{out_dir}/pem.parquet")

    meta_rows = [{"qcode": e["qcode"], "label": e["label"],
                  "description": e["description"], "is_human": e["is_human"]}
                 for e in entities]
    pq.write_table(pa.Table.from_pylist(meta_rows), f"{out_dir}/entity_meta.parquet")

    emb_rows = [{"qcode": e["qcode"],
                 "emb": hash_embed(e["label"] + " " + e["description"], emb_dim)}
                for e in entities]
    pq.write_table(
        pa.Table.from_pylist(emb_rows, schema=pa.schema(
            [("qcode", pa.string()), ("emb", pa.list_(pa.float32()))])),
        f"{out_dir}/entity_embeddings.parquet")

    pq.write_table(
        pa.Table.from_pylist([{"qcode": e["qcode"]} for e in entities if e["is_human"]]),
        f"{out_dir}/human_qcodes.parquet")

    pq.write_table(pa.Table.from_pylist(gold_rows), f"{out_dir}/gold_mentions.parquet")

    return {name: f"{out_dir}/{name}.parquet"
            for name in ["documents", "pem", "entity_meta", "entity_embeddings",
                         "human_qcodes", "gold_mentions"]}


def generate_raw_dumps(out_dir: str, n_entities: int = 50, seed: int = 42) -> dict[str, str]:
    """Synthetic raw-dump fixtures for the ETL scans (SURVEY §2.1):
      - entity_dump.jsonl: wikidata-shaped JSON lines (labels, aliases,
        claims P31/P279, sitelinks), with trailing commas + bracket lines
        like the real dump
      - redirect_dump.sql: MySQL INSERT page-redirect tuples
      - aliases.tsv: quoted (surface, page) pairs
    Entities match build_entities(seed) so ETL output is checkable against
    the relational fixtures."""
    import json

    rng = random.Random(seed)
    entities, _hot = build_entities(n_entities, rng)
    os.makedirs(out_dir, exist_ok=True)

    dump_path = f"{out_dir}/entity_dump.jsonl"
    with open(dump_path, "w") as f:
        f.write("[\n")
        for i, e in enumerate(entities):
            claims = {}
            if e["is_human"]:
                claims["P31"] = [{"type": "wikibase-item", "value": "Q5"}]
            else:
                claims["P31"] = [{"type": "wikibase-item", "value": "Q43229"}]
                claims["P279"] = [{"type": "wikibase-item", "value": "Q43229"}]
            claims["P17"] = [{"type": "string", "value": "ignored-non-item"}]
            rec = {
                "id": e["qcode"],
                "labels": {"en": {"value": e["label"]}},
                "descriptions": {"en": {"value": e["description"]}},
                "aliases": {
                    "en": [{"value": v} for v, _ in surface_variants(e)[1:]]
                },
                "claims": claims,
                "sitelinks": {"enwiki": {"title": e["label"].replace(" ", "_")}},
            }
            f.write(json.dumps(rec) + (",\n" if i < len(entities) - 1 else "\n"))
        f.write("]\n")

    sql_path = f"{out_dir}/redirect_dump.sql"
    with open(sql_path, "w") as f:
        f.write("-- MySQL dump\nDROP TABLE IF EXISTS `redirect`;\n")
        tuples = ",".join(
            f"({i},'{e['label'].replace(' ', '_')}_old','{e['label'].replace(' ', '_')}')"
            for i, e in enumerate(entities[:10])
        )
        f.write(f"INSERT INTO `redirect` VALUES {tuples};\n")

    tsv_path = f"{out_dir}/aliases.tsv"
    with open(tsv_path, "w") as f:
        for e in entities[:20]:
            f.write(f'"{e["label"].upper()}"\t{e["label"].replace(" ", "_")}\n')

    return {"entity_dump": dump_path, "redirect_sql": sql_path, "alias_tsv": tsv_path}


def generate_eval_datasets(out_dir: str, n_docs: int = 60, seed: int = 42) -> dict[str, str]:
    """Synthetic eval-dataset fixtures in the three JSONL shapes the
    reference's dataset readers consume (SURVEY §2.1 S5; reference
    dataset_factory.py:21-114 AIDA, :116-184 standard, :262-320 WebQSP):

      - aida.jsonl:     {"text", "spans": [{"start","length","uris":[...]}]}
                        uris mix wikipedia links, foreign-KB links and [].
      - standard.jsonl: {"text", "mentions": [{"start","length","wiki_name"}]}
                        wiki_name mixes titles (with spaces), "NIL" and null.
      - webqsp.jsonl:   {"text", "mentions": [[s,e],...], "wikidata_id":[...]}
      - wiki_qcode.jsonl / redirects.jsonl / disambig.jsonl: the
        title->qcode mapping side (J2/J3 shapes), including titles that
        only resolve through a redirect hop and disambiguation qcodes that
        the filter_not_in_kb path must drop.

    Deterministic for a given seed — used by both the Spark readers and the
    DuckDB oracle in the driver's correctness harness."""
    import json

    rng = random.Random(seed + 7)
    entities, _hot = build_entities(40, rng)
    os.makedirs(out_dir, exist_ok=True)

    def title(e):
        return e["label"].replace(" ", "_")

    # mapping side: every 7th entity is reachable only via redirect;
    # every 11th qcode is a disambiguation page (reader must drop it)
    wiki_rows = [{"wiki_title": title(e), "qcode": e["qcode"]} for e in entities]
    redirect_rows = [
        {"src_title": title(e) + "_(old)", "dest_title": title(e)}
        for i, e in enumerate(entities) if i % 7 == 0
    ]
    disambig_rows = [{"qcode": e["qcode"]}
                     for i, e in enumerate(entities) if i % 11 == 5]
    for name, rows in (("wiki_qcode", wiki_rows), ("redirects", redirect_rows),
                       ("disambig", disambig_rows)):
        with open(f"{out_dir}/{name}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    filler = ["reported", "today", "that", "officials", "met", "near",
              "the", "river", "before", "talks", "resumed", "quietly"]
    aida, standard, webqsp = [], [], []
    for d in range(n_docs):
        toks, spans = [], []
        pos = 0
        n_ments = 2 + rng.randrange(3)
        for m in range(n_ments):
            for _ in range(rng.randrange(3)):
                w = filler[rng.randrange(len(filler))]
                toks.append(w)
                pos += len(w) + 1
            e = entities[rng.randrange(len(entities))]
            surface = e["label"] if rng.random() < 0.7 else e["label"].split()[-1]
            toks.append(surface)
            spans.append({"start": pos, "length": len(surface),
                          "surface": surface, "entity": e})
            pos += len(surface) + 1
        text = " ".join(toks)

        def uri_for(sp, i):
            r = (d * 31 + i) % 10
            t = title(sp["entity"])
            if r < 6:
                return [f"http://en.wikipedia.org/wiki/{t}"]
            if r == 6:    # redirect-only link
                return [f"http://en.wikipedia.org/wiki/{t}_(old)"]
            if r == 7:    # unmappable page
                return [f"http://en.wikipedia.org/wiki/No_Such_Page_{i}"]
            if r == 8:    # foreign KB only -> skipped by the reader
                return [f"http://de.wikipedia.org/wiki/{t}"]
            return []     # unlinked mention -> skipped

        aida.append({"text": text, "spans": [
            {"start": sp["start"], "length": sp["length"],
             "uris": uri_for(sp, i)} for i, sp in enumerate(spans)]})

        def wiki_name_for(sp, i):
            r = (d * 17 + i) % 8
            if r == 5:
                return "NIL"
            if r == 6:
                return None
            if r == 7:
                return f"No Such Page {i}"
            return sp["entity"]["label"]  # spaces: reader converts to _

        standard.append({"text": text, "mentions": [
            {"start": sp["start"], "length": sp["length"],
             "wiki_name": wiki_name_for(sp, i)} for i, sp in enumerate(spans)]})

        webqsp.append({"text": text,
                       "mentions": [[sp["start"], sp["start"] + sp["length"]]
                                    for sp in spans],
                       "wikidata_id": [sp["entity"]["qcode"] for sp in spans]})

    for name, rows in (("aida", aida), ("standard", standard), ("webqsp", webqsp)):
        with open(f"{out_dir}/{name}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    # wikipages: anchor-tagged wiki-extractor-shaped pages for F4 (anchor
    # extraction + offset rebasing) and J5 (main-entity weak labels).
    # Built part-by-part so the CLEAN-text offsets of the md spans are
    # known exactly. URIs exercise: plain title, %20-encoded spaces,
    # lowercase first letter (title_to_key_col), redirect-only titles.
    wikipages = []
    for i, e in enumerate(entities[:30]):
        o1 = entities[(i * 3 + 1) % len(entities)]
        o2 = entities[(i * 5 + 2) % len(entities)]

        def uri_of(ent, j):
            t = title(ent)
            r = (i + j) % 4
            if r == 1:
                return t.replace("_", "%20")
            if r == 2 and (entities.index(ent) % 7 == 0):
                return t + "_(old)"
            if r == 3:
                return t[0].lower() + t[1:]
            return t

        raw_parts, clean_parts, md = [], [], []
        pos = 0

        def plain(s, is_md=False):
            nonlocal pos
            raw_parts.append(s)
            clean_parts.append(s)
            if is_md:
                md.append({"start": pos, "ln": len(s), "text": s})
            pos += len(s)

        def anchor(ent, j):
            nonlocal pos
            surf = ent["label"]
            raw_parts.append(f'<a href="{uri_of(ent, j)}">{surf}</a>')
            clean_parts.append(surf)
            pos += len(surf)

        plain(e["label"], is_md=True)        # offset-0 main-entity rule
        plain(" visited ")
        anchor(o1, 0)
        plain(" and spoke with ")
        anchor(o2, 1)
        if e["is_human"]:
            plain(" before ")
            plain(e["label"].split()[-1], is_md=True)   # surname match
            plain(" returned")
        plain(" to the region quietly ")
        plain("yesterday", is_md=True)       # md span matching no label
        wikipages.append({"title": title(e),
                          "text": "".join(raw_parts) + "\n\n",
                          "md_spans": md})
    with open(f"{out_dir}/wikipages.jsonl", "w") as f:
        for r in wikipages:
            f.write(json.dumps(r) + "\n")

    with open(f"{out_dir}/entity_meta.jsonl", "w") as f:
        for e in entities:
            f.write(json.dumps({"qcode": e["qcode"], "label": e["label"]}) + "\n")
    with open(f"{out_dir}/humans.jsonl", "w") as f:
        for e in entities:
            if e["is_human"]:
                f.write(json.dumps({"qcode": e["qcode"]}) + "\n")

    return {k: f"{out_dir}/{k}.jsonl"
            for k in ["aida", "standard", "webqsp", "wiki_qcode", "redirects",
                      "disambig", "wikipages", "entity_meta", "humans"]}
