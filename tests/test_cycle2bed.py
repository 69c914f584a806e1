"""cycle2bed conversion tests (reference ``src/cycle2bed.py``)."""
from coral_tpu.cycle2bed import convert_cycles_to_bed

CYCLES_TXT = """\
Interval\t1\tchr7\t54659673\t56149664
List of cycle segments
Segment\t1\tchr7\t54659673\t54763281
Segment\t2\tchr7\t54763282\t55127266
Segment\t3\tchr7\t55127267\t55155020
Segment\t4\tchr7\t55155021\t55609190
Segment\t5\tchr7\t55609191\t55610094
Segment\t6\tchr7\t55610095\t56049369
Segment\t7\tchr7\t56049370\t56149664
List of longest subpath constraints
Path constraint\t1\t2+,3+,4+\tSupport=6\tSatisfied
Cycle=1;Copy_count=82.346;Segments=2+,4+,6+;Path_constraints_satisfied=
Cycle=2;Copy_count=2.84;Segments=0+,2+,3+,4+,5+,6+,0-;Path_constraints_satisfied=1
"""


def _rows(path):
    with open(path) as fp:
        lines = [ln.rstrip("\n") for ln in fp if not ln.startswith("#")]
    return [ln.split("\t") for ln in lines]


def test_convert_basic(tmp_path):
    cf = tmp_path / "c.txt"
    cf.write_text(CYCLES_TXT)
    out = tmp_path / "c.bed"
    convert_cycles_to_bed(str(cf), str(out))
    rows = _rows(out)
    # Cycle 1: non-adjacent segments stay separate.
    cyc1 = [r for r in rows if r[4] == "1"]
    assert [(r[0], r[1], r[2], r[3]) for r in cyc1] == [
        ("chr7", "54763282", "55127266", "+"),
        ("chr7", "55155021", "55609190", "+"),
        ("chr7", "55610095", "56049369", "+"),
    ]
    assert all(r[5] == "True" for r in cyc1)
    # Cycle 2 (path): segments 2..6 are contiguous -> one merged row.
    cyc2 = [r for r in rows if r[4] == "2"]
    assert [(r[0], r[1], r[2], r[3]) for r in cyc2] == [
        ("chr7", "54763282", "56049369", "+"),
    ]
    assert all(r[5] == "False" for r in cyc2)


def test_wraparound_merge(tmp_path):
    txt = (
        "Segment\t1\tchr1\t1000\t1999\n"
        "Segment\t2\tchr1\t2000\t2999\n"
        "Cycle=1;Copy_count=5.0;Segments=2+,1+\n"
    )
    cf = tmp_path / "c.txt"
    cf.write_text(txt)
    out = tmp_path / "c.bed"
    convert_cycles_to_bed(str(cf), str(out))
    rows = _rows(out)
    # 2+ then 1+ wraps: 1 ends at 1999, 2 starts at 2000 -> merged into one.
    assert [(r[0], r[1], r[2], r[3]) for r in rows] == [("chr1", "1000", "2999", "+")]


def test_rotate_to_min_cyclic(tmp_path):
    txt = (
        "Segment\t1\tchr1\t1000\t1999\n"
        "Segment\t2\tchr1\t5000\t5999\n"
        "Segment\t3\tchr1\t9000\t9999\n"
        "Cycle=1;Copy_count=5.0;Segments=2+,3+,1+\n"
    )
    cf = tmp_path / "c.txt"
    cf.write_text(txt)
    out = tmp_path / "c.bed"
    convert_cycles_to_bed(str(cf), str(out), rotate_to_min=True)
    rows = _rows(out)
    assert rows[0][1] == "1000"  # starts from canonically smallest segment


def test_rotate_to_min_reverse_strand(tmp_path):
    # Smallest segment on '-' strand: rotation reverses and flips strands.
    txt = (
        "Segment\t1\tchr1\t1000\t1999\n"
        "Segment\t2\tchr1\t5000\t5999\n"
        "Cycle=1;Copy_count=5.0;Segments=2+,1-\n"
    )
    cf = tmp_path / "c.txt"
    cf.write_text(txt)
    out = tmp_path / "c.bed"
    convert_cycles_to_bed(str(cf), str(out), rotate_to_min=True)
    rows = _rows(out)
    assert rows[0][:4] == ["chr1", "1000", "1999", "+"]
    assert rows[1][:4] == ["chr1", "5000", "5999", "-"]


def test_num_cycles_limit(tmp_path):
    txt = (
        "Segment\t1\tchr1\t1000\t1999\n"
        "Cycle=1;Copy_count=5.0;Segments=1+\n"
        "Cycle=2;Copy_count=4.0;Segments=1+\n"
    )
    cf = tmp_path / "c.txt"
    cf.write_text(txt)
    out = tmp_path / "c.bed"
    convert_cycles_to_bed(str(cf), str(out), num_cycles=1)
    assert len(_rows(out)) == 1
