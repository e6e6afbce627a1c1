"""BPE tokenizer tests (round-1 VERDICT item 2).

Reference behavior being replaced: hub-downloaded GPT-2 BPE
(/root/reference/llm_rl_scripts/maze/ilql/train_ilql.py:105-106). The
in-repo BPE must round-trip exactly, keep "\n" a standalone token (env
action protocols + generation stop), persist, and actually compress
dialog-task text vs the byte baseline.
"""
import numpy as np
import pytest

from lmrl_gym_tpu.text.bpe import BPETokenizer, bytes_to_unicode, train_bpe
from lmrl_gym_tpu.text.tokenizer import ByteTokenizer, load_tokenizer, newline_id

CORPUS = [
    "move up\n",
    "move down\n",
    "move left\n",
    "move right\n",
    "The wall is to your left. The goal is at position 3 4.\n",
    "Is it a living thing? No.\n",
    "Is it a vehicle? Yes.\n",
    "Question: Is the object bigger than a breadbox? Answer: No.\n",
    "I am looking for a reliable family SUV under $40,000.",
    "Output: Decision=Accept MSRP=$35,000 Buy Price=$33,500",
] * 30


def small_tok(vocab=420):
    return train_bpe(CORPUS, vocab_size=vocab)


def test_bytes_to_unicode_bijection():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_roundtrip_corpus():
    tok = small_tok()
    for text in CORPUS:
        assert tok.decode(tok.encode(text)) == text


def test_roundtrip_random_unicode():
    tok = small_tok()
    rng = np.random.default_rng(0)
    pool = "abc XYZ 0123 €héllo\nΩ≈ç🙂"
    for _ in range(50):
        s = "".join(rng.choice(list(pool), size=rng.integers(1, 40)))
        assert tok.decode(tok.encode(s)) == s


def test_compresses_vs_bytes():
    tok = small_tok()
    byte_len = sum(len(t.encode("utf-8")) for t in CORPUS)
    bpe_len = sum(len(tok.encode(t)) for t in CORPUS)
    assert bpe_len < 0.5 * byte_len, f"{bpe_len} vs {byte_len} bytes"


def test_newline_standalone():
    tok = small_tok()
    ids = tok.encode("move up\n")
    assert ids[-1] == tok.newline_token_id
    # no learned token contains the newline char
    nl_char = tok.byte_encoder[10]
    for a, b in tok.merges:
        assert nl_char not in a + b
    # byte tokenizer agrees on the contract
    assert newline_id(ByteTokenizer()) == 10
    assert newline_id(tok) == tok.newline_token_id


def test_specials_and_ids():
    tok = small_tok()
    assert tok.pad_token_id == tok.vocab_size - 3
    assert tok.eos_token_id == tok.vocab_size - 2
    ids = tok.encode("hi", add_special_tokens=True)
    assert ids[0] == tok.bos_token_id
    assert tok.decode(ids) == "hi"


def test_save_load_roundtrip(tmp_path):
    tok = small_tok()
    path = str(tmp_path / "bpe.json")
    tok.save(path)
    tok2 = BPETokenizer.load(path)
    for text in CORPUS[:10] + ["unseen wørds 42!"]:
        assert tok2.encode(text) == tok.encode(text)
    tok3 = load_tokenizer(f"bpe:{path}")
    assert tok3.encode(CORPUS[0]) == tok.encode(CORPUS[0])


def test_training_deterministic():
    t1, t2 = small_tok(), small_tok()
    assert t1.merges == t2.merges


def test_task_trained_tokenizer_compresses_dialog():
    from lmrl_gym_tpu.text.bpe import train_bpe_for_task

    tok = train_bpe_for_task("twenty_questions", vocab_size=1024, n_episodes=20)
    byte_tok = ByteTokenizer()
    sample = (
        "Is the object a living thing?\n" "No.\n" "Is it used for transportation?\n"
    )
    assert len(tok.encode(sample)) < 0.7 * len(byte_tok.encode(sample))
    assert tok.decode(tok.encode(sample)) == sample


def test_hf_gpt2_parity_when_cached():
    """Gated on a local HF cache: our byte-level construction matches
    GPT-2's own tokenizer modulo the learned merges, so a cached HF
    tokenizer is a drop-in (models/hf.py GPT-2 import path)."""
    try:
        from transformers import AutoTokenizer

        hf = AutoTokenizer.from_pretrained("gpt2", local_files_only=True)
    except Exception:
        pytest.skip("no local HF gpt2 tokenizer cache")
    tok = load_tokenizer("gpt2")
    s = "move up\nmove down\n"
    assert tok.decode(tok.encode(s)) == s
    assert hf.decode(hf.encode(s)) == s
