"""Cleaner bank + phoneme tokenizer (espnet2/text/cleaner.py,
phoneme_tokenizer.py analogs)."""

import numpy as np
import pytest

from llm_guided_asr_tpu.text.cleaner import TextCleaner, basic_clean, tacotron_clean
from llm_guided_asr_tpu.text.phoneme import PhonemeTokenizer


def test_tacotron_cleaner():
    out = tacotron_clean("(Hello-World);   &  jr. & dr.")
    assert out == "HELLO WORLD AND JUNIOR AND DOCTOR"


def test_basic_cleaner():
    assert basic_clean("Héllo, [noise] WORLD! (cough)") == "hello world"


def test_cleaner_chain_and_unknown():
    c = TextCleaner(["basic", "upper"])
    assert c("What's Up?") == "WHAT S UP"
    with pytest.raises(ValueError):
        TextCleaner("bogus")
    with pytest.raises(RuntimeError):
        TextCleaner("jaconv")  # external dep: clear error, not silence


def test_rule_g2p_tokenizer():
    tok = PhonemeTokenizer("rule_en")
    phones = tok.text2tokens("catch fish")
    assert phones == ["K", "AE", "T", "CH", "F", "IH", "SH"]
    assert tok.tokens2text(phones) == " ".join(phones)


def test_lexicon_g2p(tmp_path):
    lex = tmp_path / "lexicon.txt"
    lex.write_text(
        "HELLO  HH AH L OW\nWORLD  W ER L D\nHELLO(2)  HH EH L OW\n"
        "a  AH\nb  B IY\n"
    )
    tok = PhonemeTokenizer(f"lexicon:{lex}")
    assert tok.text2tokens("hello world") == [
        "HH", "AH", "L", "OW", "W", "ER", "L", "D"
    ]
    # OOV falls back to letter spelling through the lexicon
    assert tok.text2tokens("ab") == ["AH", "B", "IY"]


def test_phn_token_type_trains(tmp_path):
    """token_type=phn flows through the ASR task end to end."""
    import wave

    import yaml

    rng = np.random.default_rng(0)
    phones = ["<blank>", "<unk>", "K", "AE", "T", "CH", "F", "IH", "SH",
              "<sos/eos>"]
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(phones) + "\n")
    for split in ("train", "valid"):
        d = tmp_path / split
        d.mkdir()
        n = 4 if split == "train" else 2
        with open(d / "wav.scp", "w") as fw, open(d / "text", "w") as ft:
            for i in range(n):
                u = f"utt{i}"
                p = d / f"{u}.wav"
                x = (rng.standard_normal(3200) * 3000).astype(np.int16)
                with wave.open(str(p), "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(16000)
                    w.writeframes(x.tobytes())
                fw.write(f"{u} {p}\n")
                ft.write(f"{u} catch fish\n")

    from llm_guided_asr_tpu.tasks.asr import ASRTask

    exp = tmp_path / "exp"
    cfg = {
        "token_list": str(tokens), "token_type": "phn", "g2p": "rule_en",
        "cleaner": "basic",
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
        "normalize": "utterance_mvn",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "use_cnn_module": False, "input_layer": "linear"},
        "decoder_conf": {"attention_heads": 2, "linear_units": 24,
                         "num_blocks": 1},
        "model_conf": {"ctc_weight": 0.3},
        "optim": "adam", "optim_conf": {"lr": 0.001}, "scheduler": "none",
        "batch_type": "unsorted", "batch_size": 4, "max_epoch": 1,
        "keep_nbest_models": 1, "log_interval": 50,
        "speech_pad_multiple": 4000, "text_pad_multiple": 4,
        "train_data_path_and_name_and_type": [
            [str(tmp_path / "train" / "wav.scp"), "speech", "sound"],
            [str(tmp_path / "train" / "text"), "text", "text"]],
        "valid_data_path_and_name_and_type": [
            [str(tmp_path / "valid" / "wav.scp"), "speech", "sound"],
            [str(tmp_path / "valid" / "text"), "text", "text"]],
        "output_dir": str(exp),
    }
    f = tmp_path / "phn.yaml"
    f.write_text(yaml.safe_dump(cfg))
    ASRTask.main(["--config", str(f)])
    assert (exp / "config.yaml").exists()
