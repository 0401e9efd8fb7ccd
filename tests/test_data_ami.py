"""AMI annotation-parsing tests on synthetic NITE-XML fixtures."""

import csv
import os

import numpy as np
import pytest

from avsl_tpu.data import (
    AMI_SPEAKERS,
    LengthBucketBatcher,
    collect_segments_from_transcripts,
    disfluency_laughter_to_csv,
    dialogue_acts_to_csv,
    load_disfluency_types,
    parse_words_file,
    process_transcript_files,
    segment_id,
)
from avsl_tpu.data.batching import pad_to

NITE = 'xmlns:nite="http://nite.sourceforge.net/"'

WORDS_XML = f"""<?xml version="1.0" encoding="ISO-8859-1"?>
<nite:root {NITE} nite:id="EN2001a.A.words">
  <w nite:id="EN2001a.A.words0" starttime="1.00" endtime="1.30">Hello</w>
  <w nite:id="EN2001a.A.words1" starttime="1.30" endtime="1.60">world</w>
  <w nite:id="EN2001a.A.words2" punc="true">.</w>
  <vocalsound nite:id="EN2001a.A.words3" starttime="1.70" endtime="2.10" type="laugh"/>
  <w nite:id="EN2001a.A.words4" starttime="2.20" endtime="2.40" trunc="true">wor-</w>
  <disfmarker nite:id="EN2001a.A.words5"/>
  <w nite:id="EN2001a.A.words6" starttime="2.50" endtime="2.90">again</w>
  <vocalsound nite:id="EN2001a.A.words7" starttime="3.00" endtime="3.10" type="cough"/>
  <w nite:id="EN2001a.A.words8" starttime="3.20" endtime="3.80">um</w>
</nite:root>
"""

SEGMENTS_XML = f"""<?xml version="1.0" encoding="ISO-8859-1"?>
<nite:root {NITE} nite:id="EN2001a.A.segments">
  <segment nite:id="EN2001a.sync.1" transcriber_start="1.00" transcriber_end="2.10">
    <nite:child href="EN2001a.A.words.xml#id(EN2001a.A.words0)..id(EN2001a.A.words3)"/>
  </segment>
  <segment nite:id="EN2001a.sync.2" transcriber_start="2.20" transcriber_end="3.80">
    <nite:child href="EN2001a.A.words.xml#id(EN2001a.A.words4)..id(EN2001a.A.words8)"/>
  </segment>
  <segment nite:id="EN2001a.sync.3" transcriber_start="4.0" transcriber_end="4.5"/>
</nite:root>
"""

DSFL_TYPES_XML = f"""<?xml version="1.0" encoding="ISO-8859-1"?>
<nite:root {NITE}>
  <dsfl-type nite:id="ami_dsfl_0" name="hesitation"/>
  <dsfl-type nite:id="ami_dsfl_1" name="repetition"/>
</nite:root>
"""

DISFLUENCY_XML = f"""<?xml version="1.0" encoding="ISO-8859-1"?>
<nite:root {NITE}>
  <dsfl nite:id="EN2001a.A.dsfl.1">
    <nite:pointer role="dsfl-type" href="dsfl-types.xml#id(ami_dsfl_0)"/>
    <nite:child href="EN2001a.A.words.xml#id(EN2001a.A.words8)"/>
  </dsfl>
</nite:root>
"""


@pytest.fixture()
def ami_tree(tmp_path):
    root = tmp_path / "transcripts"
    (root / "words").mkdir(parents=True)
    (root / "segments").mkdir()
    (root / "disfluency").mkdir()
    (root / "ontologies").mkdir()
    (root / "words" / "EN2001a.A.words.xml").write_text(WORDS_XML)
    (root / "segments" / "EN2001a.A.segments.xml").write_text(SEGMENTS_XML)
    (root / "disfluency" / "EN2001a.A.disfluency.xml").write_text(DISFLUENCY_XML)
    (root / "ontologies" / "dsfl-types.xml").write_text(DSFL_TYPES_XML)
    return root


def test_parse_words_file(ami_tree):
    words = parse_words_file(str(ami_tree / "words" / "EN2001a.A.words.xml"))
    assert words["EN2001a.A.words0"].text == "Hello"
    assert words["EN2001a.A.words2"].is_punct
    assert words["EN2001a.A.words3"].text == "<laugh>"
    assert words["EN2001a.A.words4"].is_trunc
    assert words["EN2001a.A.words5"].tag == "disfmarker"


def test_process_transcript_files(ami_tree, tmp_path):
    out = tmp_path / "EN2001a-A.txt"
    n = process_transcript_files(
        str(ami_tree / "segments" / "EN2001a.A.segments.xml"),
        str(ami_tree / "words" / "EN2001a.A.words.xml"),
        str(out),
    )
    lines = out.read_text().strip().split("\n")
    assert n == 2
    # punctuation attached w/o space, laugh token present
    assert lines[0] == "[1.00-2.10] Hello world. <laugh>"
    # truncated word and disfmarker dropped, cough skipped... cough becomes
    # empty text and is dropped
    assert lines[1] == "[2.20-3.80] again um"


def test_collect_segments(ami_tree, tmp_path):
    out_dir = tmp_path / "txt"
    out_dir.mkdir()
    process_transcript_files(
        str(ami_tree / "segments" / "EN2001a.A.segments.xml"),
        str(ami_tree / "words" / "EN2001a.A.words.xml"),
        str(out_dir / "EN2001a-A.txt"),
    )
    segs = collect_segments_from_transcripts(str(out_dir))
    assert len(segs) == 2
    s = segs[0]
    assert s.meeting_id == "EN2001a" and s.speaker_id == "A"
    assert s.audio_channel == "Headset-0" and s.video_channel == "Closeup1"
    assert s.segment_id == segment_id("EN2001a", "A", 1.0, 2.1)
    # min-duration filter
    segs2 = collect_segments_from_transcripts(str(out_dir), min_duration=1.5)
    assert len(segs2) == 1


def test_disfluency_csv(ami_tree, tmp_path):
    path = disfluency_laughter_to_csv(
        str(ami_tree),
        str(tmp_path / "out"),
        disfluency_dir=str(ami_tree / "disfluency"),
        dsfl_types_file=str(ami_tree / "ontologies" / "dsfl-types.xml"),
    )
    rows = list(csv.DictReader(open(path)))
    types = {(r["word"], r["disfluency_type"]) for r in rows}
    assert ("<laugh>", "laughter") in types
    assert ("um", "hesitation") in types
    # un-annotated fluent words excluded when ontology present
    assert not any(r["disfluency_type"] == "fluent" for r in rows)

    # without ontology: all words with fluent default
    path2 = disfluency_laughter_to_csv(str(ami_tree), str(tmp_path / "out2"))
    rows2 = list(csv.DictReader(open(path2)))
    assert any(r["disfluency_type"] == "fluent" for r in rows2)
    assert any(r["disfluency_type"] == "laughter" for r in rows2)


def test_disfluency_csv_strict_reference(ami_tree, tmp_path):
    """strict_reference=True reproduces the reference's exact row set
    (reference disfluency_laughter_process.py:180-214): with an ontology
    the lookup OVERWRITES the default label, so un-annotated laughs and
    fluent words drop; without one, every w/laugh row appears including
    punctuation (no punc filter in the reference producer)."""
    path = disfluency_laughter_to_csv(
        str(ami_tree),
        str(tmp_path / "strict"),
        disfluency_dir=str(ami_tree / "disfluency"),
        dsfl_types_file=str(ami_tree / "ontologies" / "dsfl-types.xml"),
        strict_reference=True,
    )
    rows = [tuple(r) for r in csv.reader(open(path))][1:]
    # golden: ONLY the annotated word survives; the un-annotated laugh is
    # dropped (the reference behavior the default mode deviates from)
    assert rows == [("EN2001a", "A", "um", "3.20", "3.80", "hesitation")]

    # without ontology: everything labeled fluent/laughter, punctuation
    # and truncated words included (reference loop has no such filters)
    path2 = disfluency_laughter_to_csv(
        str(ami_tree), str(tmp_path / "strict2"), strict_reference=True
    )
    rows2 = [tuple(r) for r in csv.reader(open(path2))][1:]
    assert rows2 == [
        ("EN2001a", "A", "Hello", "1.00", "1.30", "fluent"),
        ("EN2001a", "A", "world", "1.30", "1.60", "fluent"),
        ("EN2001a", "A", ".", "", "", "fluent"),
        ("EN2001a", "A", "<laugh>", "1.70", "2.10", "laughter"),
        ("EN2001a", "A", "wor-", "2.20", "2.40", "fluent"),
        ("EN2001a", "A", "again", "2.50", "2.90", "fluent"),
        ("EN2001a", "A", "um", "3.20", "3.80", "fluent"),
    ]

    # default mode on the same tree differs exactly by the documented
    # deviations: laugh preserved with ontology, punct/trunc filtered
    path3 = disfluency_laughter_to_csv(
        str(ami_tree),
        str(tmp_path / "default"),
        disfluency_dir=str(ami_tree / "disfluency"),
        dsfl_types_file=str(ami_tree / "ontologies" / "dsfl-types.xml"),
    )
    rows3 = [tuple(r) for r in csv.reader(open(path3))][1:]
    assert ("EN2001a", "A", "<laugh>", "1.70", "2.10", "laughter") in rows3


def test_load_disfluency_types(ami_tree):
    types = load_disfluency_types(str(ami_tree / "ontologies" / "dsfl-types.xml"))
    assert types == {"ami_dsfl_0": "hesitation", "ami_dsfl_1": "repetition"}


DACT_XML = f"""<?xml version="1.0" encoding="ISO-8859-1"?>
<nite:root {NITE}>
  <dact nite:id="EN2001a.A.dact.1">
    <nite:pointer role="da-aspect" href="da-types.xml#id(ami_da_2)"/>
    <nite:child href="EN2001a.A.words.xml#id(EN2001a.A.words0)..id(EN2001a.A.words1)"/>
  </dact>
</nite:root>
"""

DA_TYPES_XML = f"""<?xml version="1.0" encoding="ISO-8859-1"?>
<nite:root {NITE} name="da-types">
  <da-type nite:id="ami_da_1" name="info" gloss="Information">
    <da-type nite:id="ami_da_2" name="inform" gloss="Give information"/>
  </da-type>
</nite:root>
"""

AP_XML = f"""<?xml version="1.0" encoding="ISO-8859-1"?>
<nite:root {NITE}>
  <adjacency-pair nite:id="EN2001a.ap.1">
    <nite:pointer role="type" href="ap-types.xml#id(ami_ap_1)"/>
    <nite:pointer role="source" href="EN2001a.A.dialog-act.xml#id(EN2001a.A.dact.1)"/>
    <nite:pointer role="target" href="EN2001a.B.dialog-act.xml#id(EN2001a.B.dact.7)"/>
  </adjacency-pair>
</nite:root>
"""

AP_TYPES_XML = f"""<?xml version="1.0" encoding="ISO-8859-1"?>
<nite:root {NITE}>
  <ap-type nite:id="ami_ap_1" gloss="positive"/>
</nite:root>
"""


def test_dialogue_acts_csv(ami_tree, tmp_path):
    da_dir = ami_tree / "dialogueActs"
    da_dir.mkdir()
    (da_dir / "EN2001a.A.dialog-act.xml").write_text(DACT_XML)
    (da_dir / "EN2001a.adjacency-pairs.xml").write_text(AP_XML)
    (ami_tree / "ontologies" / "da-types.xml").write_text(DA_TYPES_XML)
    (ami_tree / "ontologies" / "ap-types.xml").write_text(AP_TYPES_XML)

    out = dialogue_acts_to_csv(
        str(ami_tree),
        str(tmp_path / "da_out"),
        da_types_file=str(ami_tree / "ontologies" / "da-types.xml"),
        ap_types_file=str(ami_tree / "ontologies" / "ap-types.xml"),
    )
    da_rows = list(csv.DictReader(open(out["dialogue_acts"])))
    assert len(da_rows) == 2  # Hello + world
    assert da_rows[0]["dialogue_act_type"] == "inform"
    assert da_rows[0]["dialogue_act_category"] == "info"
    assert da_rows[0]["event_type"] == "fluent"

    ap_rows = list(csv.DictReader(open(out["adjacency_pairs"])))
    assert ap_rows[0]["pair_type_gloss"] == "positive"
    assert ap_rows[0]["source_speaker_id"] == "A"
    assert ap_rows[0]["target_dact_id"] == "EN2001a.B.dact.7"

    joined_rows = list(csv.DictReader(open(out["joined"])))
    matched = [r for r in joined_rows if r.get("pair_id")]
    assert matched, "join should attach the adjacency pair to dact.1 words"


def test_length_bucket_batcher():
    rng = np.random.default_rng(0)
    lengths = rng.integers(80, 1000, 200)
    batcher = LengthBucketBatcher(
        lengths, batch_bins=4000, num_shards=4, boundaries=[128, 256, 512, 1024]
    )
    seen = set()
    for idx, padded in batcher.batches(shuffle=True, epoch=0):
        assert len(idx) % 4 == 0
        assert (lengths[idx] <= padded).all()
        assert padded in (128, 256, 512, 1024)
        assert len(idx) * padded <= 4000 + 4 * padded  # budget (+shard pad slack)
        seen.update(idx.tolist())
    assert seen == set(range(200))  # every item appears

    # determinism per epoch seed
    a = [tuple(i) for i, _ in batcher.batches(shuffle=True, epoch=1)]
    b = [tuple(i) for i, _ in batcher.batches(shuffle=True, epoch=1)]
    assert a == b


def test_pad_to():
    x = np.arange(6).reshape(3, 2)
    assert pad_to(x, 5).shape == (5, 2)
    assert pad_to(x, 2).shape == (2, 2)
    np.testing.assert_array_equal(pad_to(x, 4)[3], 0)
