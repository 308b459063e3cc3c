"""Span-document encoding: PII record dict <-> interleaved span list.

The pipeline input (driver ``input_hint``) is
``documents(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)``:
one patient record per document, PII fields encoded as text spans
interleaved with opaque media spans. Linkage ignores media spans but must
preserve the full span sequence bit-for-bit (per-row invariant:
span-sequence equality on kind/text/media_ref/order).

Encoding (deterministic, index-addressed so repeated groups round-trip):

    scalar fields    kind = 'external_id' | 'birth_date' | 'sex'
    repeated scalar  kind = 'race' (one span per value, in order)
    name groups      kind = 'name[<i>].given'   (repeated, in order)
                            'name[<i>].family' | 'name[<i>].suffix'
                            'name[<i>].use'
    address groups   kind = 'address[<i>].line' (repeated, in order)
                            'address[<i>].city|state|postal_code|county'
    telecom groups   kind = 'telecom[<i>].value' | 'telecom[<i>].system'
    identifiers      kind = 'identifier[<i>].type|value|authority'
    media            kind = 'media', text = '', media_ref = opaque uri

Offsets are strictly increasing. This module is driver/test-side (used by
the synthesizer and fixtures); the distributed decoder lives in
sources/ingest.py as pure Spark expressions.
"""

from __future__ import annotations

import typing

Span = tuple[str, str, str, int]  # (kind, text, media_ref, offset)


def pii_to_spans(
    record: dict[str, typing.Any],
    media_refs: typing.Sequence[tuple[int, str]] = (),
) -> list[Span]:
    """Encode a PII record dict into an ordered span list.

    :param record: dict with optional keys external_id, birth_date, sex,
        name, address, telecom, race, identifiers (shapes per the
        reference PIIRecord, src/recordlinker/schemas/pii.py:339-356).
    :param media_refs: (position, uri) pairs; each media span is inserted
        at that position in the text-span sequence (interleaving).
    """
    out: list[tuple[str, str, str]] = []

    def emit(kind: str, text: typing.Any) -> None:
        if text is None:
            return
        out.append((kind, str(text), ""))

    emit("external_id", record.get("external_id"))
    emit("birth_date", record.get("birth_date"))
    emit("sex", record.get("sex"))
    for i, name in enumerate(record.get("name") or []):
        for g in name.get("given") or []:
            emit(f"name[{i}].given", g)
        emit(f"name[{i}].family", name.get("family"))
        for s in name.get("suffix") or []:
            emit(f"name[{i}].suffix", s)
        emit(f"name[{i}].use", name.get("use"))
    for i, addr in enumerate(record.get("address") or []):
        for line in addr.get("line") or []:
            emit(f"address[{i}].line", line)
        emit(f"address[{i}].city", addr.get("city"))
        emit(f"address[{i}].state", addr.get("state"))
        emit(f"address[{i}].postal_code", addr.get("postal_code"))
        emit(f"address[{i}].county", addr.get("county"))
    for i, tel in enumerate(record.get("telecom") or []):
        emit(f"telecom[{i}].value", tel.get("value"))
        emit(f"telecom[{i}].system", tel.get("system"))
    for r in record.get("race") or []:
        emit("race", r)
    for i, ident in enumerate(record.get("identifiers") or []):
        emit(f"identifier[{i}].type", ident.get("type"))
        emit(f"identifier[{i}].value", ident.get("value"))
        emit(f"identifier[{i}].authority", ident.get("authority"))

    # interleave media spans at requested positions.  Ascending
    # insertion with a running offset (+j for the j media already
    # placed) keeps the documented order: same-position media stay in
    # listing order, and positions clamped past the end append in
    # listing order too (the previous descending insertion REVERSED
    # both cases).
    full: list[tuple[str, str, str]] = list(out)
    media_sorted = sorted(
        enumerate(media_refs), key=lambda x: (x[1][0], x[0])
    )
    for j, (_, (pos, uri)) in enumerate(media_sorted):
        full.insert(min(pos + j, len(full)), ("media", "", uri))
    return [(k, t, m, off) for off, (k, t, m) in enumerate(full)]


def spans_to_rows(spans: typing.Sequence[Span]) -> list[dict]:
    """Span tuples -> spans-column struct dicts — the ONE place that
    knows the struct field layout (synth.py and docs_to_rows both build
    through here, so the synthetic corpus cannot drift from the fixture
    encoding)."""
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": o}
        for (k, t, m, o) in spans
    ]


def docs_to_rows(
    docs: typing.Iterable[tuple[str, dict, typing.Sequence[tuple[int, str]]]],
) -> list[dict]:
    """Build documents-table rows from (doc_id, record, media_refs) triples."""
    return [
        {
            "doc_id": doc_id,
            "spans": spans_to_rows(pii_to_spans(record, media_refs)),
        }
        for doc_id, record, media_refs in docs
    ]
