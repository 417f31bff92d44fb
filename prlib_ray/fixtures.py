"""Deterministic transcript synthesis (the repo's test_data/ analogue).

Transcripts have exactly the BASELINE.json input_hint shape:
(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp[us]).  They are derived from the driver's ``documents``
table — one conversation per document, turn payloads built from the
document's words plus injected noise mirroring the reference corpora
(FIXTURES.md): HTML-ish boilerplate (nav/link-farm/cookie/footer),
separator runs, salt-pepper control chars, hyphen-wrapped lines, curly
quotes, shuffled arrival order, fully-reversed conversations, and
mega-threads for skew.

Everything is a pure function of (doc_id, document text) via a per-
conversation ``random.Random`` seeded from doc_id — no global RNG, no
order dependence, identical on every worker (Mersenne Twister is
platform-stable in CPython 3).
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from prlib_ray.schema import TRANSCRIPT_SCHEMA

import os

EPOCH_US = 1_577_836_800_000_000  # 2020-01-01
MEGA_EVERY = 211  # doc_id % MEGA_EVERY == 0 -> mega-thread (skew fixture)
MEGA_TURNS = 400
REVERSED_EVERY = 17  # doc_id % REVERSED_EVERY == 3 -> reversed arrival order

# bench knob: scales every conversation's turn count (deterministic for a
# given value; tests/goldens run at 1)
TURNS_MULT = int(os.environ.get("GRAFT_TURNS_MULT", "1"))

NAV = "Home | About | Products | Pricing | Contact | Careers | Blog"
COOKIE = "We use cookies to improve your experience. Accept all cookies?"
FOOTER = "(c) 2020 ExampleCorp Inc. All rights reserved. Privacy Terms"
LINKS = "<a href=http://ex.com/a>click</a> <a href=http://ex.com/b>here</a> <a href=http://ex.com/c>now</a>"
SEP = "--------"
ROLES = ("user", "assistant")


def conv_rows(doc_id: int, text: str) -> list[dict]:
    """One conversation's rows (pure function of its inputs)."""
    rng = random.Random(f"prlib:{doc_id}")
    words = [w for w in text.split(" ") if w] or ["empty"]
    n_turns = TURNS_MULT * (
        MEGA_TURNS if doc_id % MEGA_EVERY == 0 else 3 + doc_id % 8
    )
    conv_id = f"conv-{doc_id:08d}"
    rows = []
    for ti in range(n_turns):
        role = "system" if ti == 0 and doc_id % 5 == 0 else ROLES[ti % 2]
        tool = ""
        if ti % 7 == 4:
            role, tool = "tool", f"tool_{ti % 3}"
        lines = []
        # leading furniture (autoCrop analogue)
        if rng.random() < 0.5:
            lines.append(NAV)
        if rng.random() < 0.3:
            lines.append(LINKS)
        # content lines
        n_content = rng.randint(2, 5)
        for _ in range(n_content):
            k = rng.randint(8, 16)
            start = rng.randrange(len(words))
            ws = [words[(start + j) % len(words)] for j in range(k)]
            line = " ".join(ws)
            r = rng.random()
            if r < 0.15:  # hyphen wrap (deblur fixture)
                line = line.replace(" ", "- ", 1)
            elif r < 0.25:  # curly quotes (gamma fixture)
                line = "“" + line + "”"
            elif r < 0.32:  # salt-pepper (denoise fixture)
                pos = rng.randrange(len(line))
                line = line[:pos] + "�" + line[pos:]
            lines.append(line)
        # mid furniture
        if rng.random() < 0.25:
            lines.append(SEP)
        if rng.random() < 0.4:
            lines.append(COOKIE)
        # trailing furniture
        if rng.random() < 0.5:
            lines.append(FOOTER)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": ti,
                "role": role,
                "text": "\n".join(lines),
                "tool": tool,
                "ts": EPOCH_US + doc_id * 3_600_000_000 + ti * 60_000_000,
            }
        )
    # reversed conversations: timestamps run backwards (orientation fixture)
    if doc_id % REVERSED_EVERY == 3:
        n = len(rows)
        for r in rows:
            r["ts"] = EPOCH_US + doc_id * 3_600_000_000 + (n - 1 - int(r["turn_idx"])) * 60_000_000
    # shuffled arrival order (deskew fixture) — deterministic permutation
    rng.shuffle(rows)
    return rows


def synth_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> transcript rows (the 1->N flat-map ingest stage)."""
    out: list[dict] = []
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        out.extend(conv_rows(int(did), text))
    return pa.table(
        {
            "conv_id": pa.array([r["conv_id"] for r in out], type=pa.string()),
            "turn_idx": pa.array([r["turn_idx"] for r in out], type=pa.int32()),
            "role": pa.array([r["role"] for r in out], type=pa.string()),
            "text": pa.array([r["text"] for r in out], type=pa.string()),
            "tool": pa.array([r["tool"] for r in out], type=pa.string()),
            "ts": pa.array(
                np.array([r["ts"] for r in out], dtype="datetime64[us]"),
                type=pa.timestamp("us"),
            ),
        }
    )


def transcripts_dataset(sf_dir: str):
    """Lazy Dataset of synthesized transcripts at ``sf_dir`` scale."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        synth_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
    )


def assert_schema(tbl: pa.Table) -> None:
    assert tbl.schema.equals(TRANSCRIPT_SCHEMA), tbl.schema
