"""r17 (VERDICT r16 ask #3): `audio=` fingerprint passthrough.

multimodal_dedup_verdict's audio stage feeds the fingerprint table to
BOTH sides of a rep self-join (the aggregate build side and the probe
side); un-checkpointed, Catalyst executes the WAV synthesize+decode
twice. The composed pipeline now fingerprints once into a checkpoint
and hands it to the verdict via ``audio=`` — the same pattern as the
``pixels=``/``ahash=`` passthroughs. Pins: byte-identical verdicts, and
the single-attach contract counted at the source (the audio sibling of
test_r16_imaging_plan_shapes.py's single-decode pin).
"""

from __future__ import annotations

import ngff_zarr_spark.gate as gate


def test_verdict_audio_passthrough_identical(spark, sf_dir):
    """verdict(audio=checkpointed fingerprint) ≡ verdict() row-for-row."""
    from ngff_zarr_spark.functions.multimodal import (
        audio_fingerprint,
        multimodal_dedup_verdict,
    )

    docs = gate._docs(spark, sf_dir).limit(40).localCheckpoint()
    base = sorted(map(tuple, multimodal_dedup_verdict(docs).collect()))
    afp = audio_fingerprint(docs).localCheckpoint()
    via = sorted(
        map(tuple, multimodal_dedup_verdict(docs, audio=afp).collect())
    )
    assert base == via
    assert len(base) == 40


def test_multimodal_pipeline_single_audio_decode(spark, sf_dir, monkeypatch):
    """The composed multimodal gate synthesizes each document's WAV
    payload in exactly ONE attach_audio pass: the fingerprint is
    checkpointed and the verdict consumes it via ``audio=`` (without
    the passthrough, the verdict's rep self-join attaches twice)."""
    import ngff_zarr_spark.functions.multimodal as mm

    calls = []
    real = mm.attach_audio

    def counting_attach(docs):
        calls.append(1)
        return real(docs)

    monkeypatch.setattr(mm, "attach_audio", counting_attach)
    rows = gate.q_multimodal_pipeline_battery(spark, sf_dir).collect()
    assert len(rows) == 5
    assert sum(calls) == 1, f"attach_audio ran {sum(calls)} times"
