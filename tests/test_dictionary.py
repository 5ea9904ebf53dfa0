from pathlib import Path

from streamspeech_tpu.dictionary import Dictionary
from streamspeech_tpu.tokenizer import SentencePieceUnigram

REF = Path("/root/reference/configs/fr-en")


def test_special_layout():
    d = Dictionary()
    assert d.bos() == 0 and d.pad() == 1 and d.eos() == 2 and d.unk() == 3
    assert len(d) == 4


def test_units_dictionary():
    d = Dictionary.units(1000)
    assert len(d) == 1004
    assert d.index("0") == 4 and d.index("999") == 1003
    b = d.add_blank()
    assert b == 1004 and len(d) == 1005


def test_load_reference_vocab():
    if not REF.exists():
        return
    d = Dictionary.load(str(REF / "src_unigram6000" / "spm_unigram_fr.txt"))
    # file has 5996 pieces (6000 SPM minus its 4 specials) + our 4 specials
    assert len(d) == 6000
    assert d.index("▁de") != d.unk()


def test_encode_decode_roundtrip():
    d = Dictionary()
    ids = d.encode_line("a b a", add_if_not_exist=True)
    assert ids[-1] == d.eos()
    assert d.string(ids) == "a b a"


def test_spm_model_parse_and_encode():
    model = REF / "src_unigram6000" / "spm_unigram_fr.model"
    if not model.exists():
        return
    sp = SentencePieceUnigram.load(str(model))
    assert len(sp.pieces) >= 6000
    pieces = sp.encode_as_pieces("je voulais soumettre cette idée")
    assert len(pieces) > 0
    assert sp.decode_pieces(pieces) == "je voulais soumettre cette idée"
    # pieces must exist in the vocabulary file used for the fairseq dictionary
    d = Dictionary.load(str(model.parent / "spm_unigram_fr.txt"))
    known = sum(1 for p in pieces if d.index(p) != d.unk())
    assert known >= len(pieces) - 1
