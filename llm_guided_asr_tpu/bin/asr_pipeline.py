#!/usr/bin/env python3
"""End-to-end ASR recipe pipeline (egs2/TEMPLATE/asr1/asr.sh analog).

A python stage runner over Kaldi-format data dirs (wav.scp + text), keeping
the reference's stage numbering where the stage exists here:

  stage 1   data validation (local/data.sh + validate_data_dir.sh analog)
  stage 2   speed perturbation (sox 0.9/1.0/1.1 analog; --speed_perturb)
  stage 3   wav format/validation (format_wav_scp: resolve+check audio)
  stage 4   remove long/short utterances (asr.sh:799)
  stage 5   token list generation (char; asr.sh:877-968)
  stage 6-7 LM training on the corpus text (asr.sh:1007-1159; --use_lm true)
  stage 8   LM perplexity on valid text (asr.sh:1160)
  stage 9   ngram ARPA training (asr.sh:1179; --use_ngram true)
  stage 10  collect stats (asr.sh:1189)
  stage 11  ASR training (asr.sh:1308)
  stage 12  decoding (asr.sh:1480; shallow-fuses the stage-6 LM when trained)
  stage 13  scoring + per-utterance alignment report (asr.sh:1621)
  stage 14  pack the model bundle (asr.sh:1727)
  stage 15  model-zoo export artifact (asr.sh:1760; upload needs network)

Multi-job stages run through the cmd.sh abstraction (utils/job.py):
--cmd_backend local|stdout|slurm|sge|ssh, --cmd_conf <queue.conf>.

Usage:
  python -m llm_guided_asr_tpu.bin.asr_pipeline --config conf/train.yaml \
      --train_dir data/train --valid_dir data/valid --test_dir data/test \
      --expdir exp/run1 --stage 3 --stop_stage 13
"""

from __future__ import annotations

import json
import logging
import sys
from pathlib import Path

logger = logging.getLogger(__name__)

DEFAULTS = {
    "config": None,
    "train_dir": None,
    "valid_dir": None,
    "test_dir": None,
    "expdir": "exp/asr",
    "stage": 3,
    "stop_stage": 13,
    "speed_perturb": None,    # e.g. "0.9,1.0,1.1" (asr.sh:579 stage 2)
    "min_samples": 800,       # remove-short threshold (samples)
    "max_samples": 480000,    # remove-long threshold (30 s @ 16 kHz)
    "token_type": "char",
    "nbest": 1,
    "beam_size": 10,
    "ctc_weight": 0.3,
    "decode_nj": 1,   # multi-job decode splitting (asr.sh:1480)
    "cmd_backend": "local",  # cmd.sh cmd_backend (utils/job.py JobRunner)
    "cmd_conf": None,        # {queue,slurm}.conf-style option mapping
    "use_lm": False,
    "lm_config": None,   # YAML for LMTask (lm_conf etc.); defaults used if None
    "lm_weight": 0.3,
    "use_ngram": False,
    "ngram_order": 3,
    "device": None,
}


def _read_dir(d: Path):
    from llm_guided_asr_tpu.data.fileio import read_2columns_text

    return read_2columns_text(d / "wav.scp"), read_2columns_text(d / "text")


def stage3_format(data_dir: Path, out_dir: Path, cfg):
    """Validate audio is readable; write normalized wav.scp/text.

    Entries may be wav/flac paths, 'cmd |' pipes, or ark:offset rxfilenames
    (format_wav_scp analog, asr.sh:614)."""
    from llm_guided_asr_tpu.data.fileio import read_audio

    wavs, texts = _read_dir(data_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    kept = []
    for uid, path in wavs.items():
        if uid not in texts:
            continue
        try:
            rate, data = read_audio(path)
        except Exception as e:
            logger.warning(f"stage3: dropping {uid}: {e}")
            continue
        kept.append((uid, path, len(data)))
    with open(out_dir / "wav.scp", "w") as fw, open(out_dir / "text", "w") as ft, open(
        out_dir / "utt2num_samples", "w"
    ) as fn:
        for uid, path, n in kept:
            fw.write(f"{uid} {path}\n")
            ft.write(f"{uid} {texts[uid]}\n")
            fn.write(f"{uid} {n}\n")
    logger.info(f"stage3 [{data_dir.name}]: kept {len(kept)}/{len(wavs)}")


def stage4_filter(work_dir: Path, cfg):
    from llm_guided_asr_tpu.data.fileio import read_2columns_text

    nsamples = {
        k: int(v) for k, v in read_2columns_text(work_dir / "utt2num_samples").items()
    }
    keep = {
        k for k, n in nsamples.items()
        if cfg["min_samples"] <= n <= cfg["max_samples"]
    }
    for name in ("wav.scp", "text", "utt2num_samples"):
        lines = (work_dir / name).read_text().splitlines()
        with open(work_dir / name, "w") as f:
            for line in lines:
                if line.split(maxsplit=1)[0] in keep:
                    f.write(line + "\n")
    logger.info(f"stage4 [{work_dir.name}]: kept {len(keep)}/{len(nsamples)}")


def stage5_token_list(train_dir: Path, out_file: Path, cfg):
    from llm_guided_asr_tpu.data.fileio import read_2columns_text
    from llm_guided_asr_tpu.text.tokenizers import CharTokenizer

    texts = read_2columns_text(train_dir / "text")
    tok = CharTokenizer()
    vocab = set()
    for t in texts.values():
        vocab.update(tok.text2tokens(t))
    token_list = ["<blank>", "<unk>"] + sorted(vocab) + ["<sos/eos>"]
    out_file.parent.mkdir(parents=True, exist_ok=True)
    out_file.write_text("\n".join(token_list) + "\n")
    logger.info(f"stage5: {len(token_list)} tokens -> {out_file}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config, load_yaml

    raw = list(cmd if cmd is not None else sys.argv[1:])
    # --config names the *training* yaml passed through to ASRTask — extract
    # it before build_config would merge it into the pipeline options
    train_config = None
    filtered = []
    i = 0
    while i < len(raw):
        if raw[i] == "--config":
            train_config = raw[i + 1]
            i += 2
        elif raw[i].startswith("--config="):
            train_config = raw[i].split("=", 1)[1]
            i += 1
        else:
            filtered.append(raw[i])
            i += 1
    cfg = build_config(filtered, {**DEFAULTS})
    cfg["config"] = train_config
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    stage, stop = int(cfg["stage"]), int(cfg["stop_stage"])
    expdir = Path(cfg["expdir"])
    work = expdir / "data"
    token_file = expdir / "tokens.txt"
    stats_dir = expdir / "stats"
    train_exp = expdir / "train"

    dirs = {
        "train": Path(cfg["train_dir"]),
        "valid": Path(cfg["valid_dir"]),
    }
    if cfg.get("test_dir"):
        dirs["test"] = Path(cfg["test_dir"])

    if stage <= 1 <= stop:
        # stage 1: data preparation/validation (asr.sh:571 local/data.sh +
        # utils/validate_data_dir.sh analog): every split must have a
        # consistent wav.scp/text pair — duplicate or mismatched utt-ids and
        # whitespace-broken lines fail loudly before any compute is spent
        for split, d in dirs.items():
            for fname in ("wav.scp", "text"):
                if not (d / fname).exists():
                    raise FileNotFoundError(f"stage1 [{split}]: missing {d / fname}")
            wav_ids, text_ids = [], []
            for fname, acc in (("wav.scp", wav_ids), ("text", text_ids)):
                for ln, line in enumerate((d / fname).read_text().splitlines(), 1):
                    if not line.strip():
                        continue
                    parts = line.split(maxsplit=1)
                    if len(parts) < 2:
                        raise ValueError(
                            f"stage1 [{split}]: {fname}:{ln} has no value: {line!r}"
                        )
                    acc.append(parts[0])
            for fname, ids in (("wav.scp", wav_ids), ("text", text_ids)):
                if len(set(ids)) != len(ids):
                    dup = sorted({u for u in ids if ids.count(u) > 1})[:5]
                    raise ValueError(f"stage1 [{split}]: duplicate ids in {fname}: {dup}")
            missing = sorted(set(wav_ids) ^ set(text_ids))
            if missing:
                raise ValueError(
                    f"stage1 [{split}]: wav.scp/text utt-id mismatch "
                    f"(first few: {missing[:5]})"
                )
            logger.info(f"stage1 [{split}]: {len(wav_ids)} utterances ok")

    if cfg.get("speed_perturb") and stage <= 2 <= stop:
        # stage 2: offline speed-perturbed copies of the TRAIN split only
        # (perturb_data_dir_speed, asr.sh:579; 'sp<f>-<uid>' naming)
        import numpy as np

        from llm_guided_asr_tpu.data.fileio import (
            read_2columns_text,
            read_audio,
            write_wav,
        )
        from llm_guided_asr_tpu.ops.augment import speed_perturb

        factors = [float(f) for f in str(cfg["speed_perturb"]).split(",")]
        src = dirs["train"]
        sp_dir = work / "train_sp"
        sp_dir.mkdir(parents=True, exist_ok=True)
        wavs = read_2columns_text(src / "wav.scp")
        texts = read_2columns_text(src / "text")
        with open(sp_dir / "wav.scp", "w") as fw, open(sp_dir / "text", "w") as ft:
            for uid, path in wavs.items():
                if uid not in texts:
                    continue
                rate, wav = read_audio(path)
                for f in factors:
                    if abs(f - 1.0) < 1e-6:
                        fw.write(f"{uid} {path}\n")
                        ft.write(f"{uid} {texts[uid]}\n")
                        continue
                    new_uid = f"sp{f:g}-{uid}"
                    p = sp_dir / f"{new_uid}.wav"
                    write_wav(p, rate, speed_perturb(np.asarray(wav, np.float32), f))
                    fw.write(f"{new_uid} {p}\n")
                    ft.write(f"{new_uid} {texts[uid]}\n")
        dirs["train"] = sp_dir
        logger.info(f"stage2: speed-perturbed train -> {sp_dir} (x{len(factors)})")
    elif cfg.get("speed_perturb"):
        # re-run starting past stage 2: the perturbed dir must still be the
        # train source (the reference derives the _sp dir name from config on
        # every run, asr.sh:579-613); silently training on unperturbed data
        # would change the recipe semantics between invocations
        sp_dir = work / "train_sp"
        if sp_dir.exists():
            dirs["train"] = sp_dir
            logger.info(f"speed_perturb set: reusing existing {sp_dir}")
        elif stage > 2:
            raise SystemExit(
                f"--speed_perturb is set but {sp_dir} does not exist; "
                "run stage 2 first (or drop --speed_perturb)"
            )

    if stage <= 3 <= stop:
        for split, d in dirs.items():
            stage3_format(d, work / split, cfg)
    if stage <= 4 <= stop:
        for split in dirs:
            stage4_filter(work / split, cfg)
    if stage <= 5 <= stop:
        stage5_token_list(work / "train", token_file, cfg)

    train_args = []
    if cfg.get("config"):
        train_args += ["--config", str(cfg["config"])]
    if cfg.get("device"):
        train_args += ["--device", str(cfg["device"])]
    data_args = [
        "--token_list", str(token_file),
        "--train_data_path_and_name_and_type",
        json.dumps([[str(work / "train" / "wav.scp"), "speech", "sound"],
                    [str(work / "train" / "text"), "text", "text"]]),
        "--valid_data_path_and_name_and_type",
        json.dumps([[str(work / "valid" / "wav.scp"), "speech", "sound"],
                    [str(work / "valid" / "text"), "text", "text"]]),
    ]

    from llm_guided_asr_tpu.tasks.asr import ASRTask

    lm_exp = expdir / "lm"
    if cfg.get("use_lm") and stage <= 7 <= stop:
        # stages 6-7: LM stats + LM training on the corpus text (asr.sh:1007)
        from llm_guided_asr_tpu.tasks.lm import LMTask

        lm_args = ["--token_list", str(token_file)]
        if cfg.get("lm_config"):
            lm_args += ["--config", str(cfg["lm_config"])]
        if cfg.get("device"):
            lm_args += ["--device", str(cfg["device"])]
        LMTask.main(lm_args + [
            "--train_data_path_and_name_and_type",
            json.dumps([[str(work / "train" / "text"), "text", "text"]]),
            "--valid_data_path_and_name_and_type",
            json.dumps([[str(work / "valid" / "text"), "text", "text"]]),
            "--output_dir", str(lm_exp),
        ])
    if cfg.get("use_lm") and stage <= 8 <= stop:
        # stage 8: perplexity on the valid text (asr.sh:1160)
        from llm_guided_asr_tpu.tasks.lm import calc_perplexity

        lm_model = next(lm_exp.glob("valid.*.ave_*best.msgpack"), None) or (
            lm_exp / "latest.msgpack"
        )
        ppl = calc_perplexity(
            lm_exp / "config.yaml", lm_model,
            [(str(work / "valid" / "text"), "text", "text")],
        )
        (lm_exp / "perplexity_valid").write_text(f"{ppl}\n")
        logger.info(f"stage8: valid perplexity = {ppl:.2f}")
    ngram_file = expdir / "ngram" / f"{cfg.get('ngram_order', 3)}gram.arpa"
    if cfg.get("use_ngram") and stage <= 9 <= stop:
        # stage 9: count-based ngram in ARPA format (asr.sh:1179 lmplz analog)
        from llm_guided_asr_tpu.data.fileio import read_2columns_text
        from llm_guided_asr_tpu.search.ngram import build_arpa

        texts = read_2columns_text(work / "train" / "text")
        if cfg["token_type"] == "char":
            sents = [list(t.replace(" ", "")) for t in texts.values()]
        else:
            sents = [t.split() for t in texts.values()]
        ngram_file.parent.mkdir(parents=True, exist_ok=True)
        build_arpa(sents, ngram_file, order=int(cfg.get("ngram_order", 3)))
        logger.info(f"stage9: wrote {ngram_file}")

    if stage <= 10 <= stop:
        ASRTask.main(train_args + data_args + [
            "--collect_stats", "true", "--output_dir", str(stats_dir),
        ])
    if stage <= 11 <= stop:
        ASRTask.main(train_args + data_args + [
            "--output_dir", str(train_exp),
            "--normalize_conf", f"stats_file={stats_dir / 'train' / 'feats_stats.npz'}",
        ])
    if stage <= 12 <= stop:
        from llm_guided_asr_tpu.bin.asr_inference import inference

        model_file = next(train_exp.glob("valid.*.ave_*best.msgpack"), None) or (
            train_exp / "latest.msgpack"
        )
        test_split = "test" if "test" in dirs else "valid"
        fusion = {}
        if cfg.get("use_lm") and (lm_exp / "config.yaml").exists():
            lm_model = next(lm_exp.glob("valid.*.ave_*best.msgpack"), None) or (
                lm_exp / "latest.msgpack"
            )
            fusion = dict(
                lm_train_config=str(lm_exp / "config.yaml"),
                lm_file=str(lm_model),
                lm_weight=float(cfg.get("lm_weight", 0.3)),
            )
        nj = int(cfg.get("decode_nj", 1))
        if nj <= 1:
            inference(
                str(expdir / "decode" / test_split),
                [(str(work / test_split / "wav.scp"), "speech", "sound")],
                str(train_exp / "config.yaml"),
                str(model_file),
                beam_size=int(cfg["beam_size"]),
                ctc_weight=float(cfg["ctc_weight"]),
                nbest=int(cfg["nbest"]),
                **fusion,
            )
        else:
            # multi-job decode (asr.sh:1480 job splitting via split_scps):
            # shard wav.scp, decode shards as concurrent subprocesses, merge
            import subprocess
            import sys as _sys

            from llm_guided_asr_tpu.bin.split_scps import split_scps

            dec_dir = expdir / "decode" / test_split
            shard_dir = dec_dir / "split"
            split_scps([str(work / test_split / "wav.scp")], nj, str(shard_dir))
            shards = [shard_dir / f"wav.scp.{j}" for j in range(1, nj + 1)]
            # concurrency only when each job can own a device: a TPU chip is
            # process-exclusive (and this process may already hold it), so
            # non-CPU runs execute jobs sequentially — the splitting/merge
            # contract (asr.sh job arrays) is what cluster dispatch reuses
            # array job through the cmd.sh abstraction (decode_cmd analog):
            # JOB is substituted per shard; backend from --cmd_backend
            # (local|stdout|slurm|sge|ssh, utils/job.py)
            from llm_guided_asr_tpu.utils.job import JobOptions, JobRunner

            args = [_sys.executable, "-m",
                    "llm_guided_asr_tpu.bin.asr_inference",
                    "--output_dir", str(dec_dir / "jobJOB"),
                    "--data_path_and_name_and_type",
                    f"{shard_dir}/wav.scp.JOB,speech,sound",
                    "--asr_train_config", str(train_exp / "config.yaml"),
                    "--asr_model_file", str(model_file),
                    "--beam_size", str(cfg["beam_size"]),
                    "--ctc_weight", str(cfg["ctc_weight"]),
                    "--nbest", str(cfg["nbest"])]
            if cfg.get("device"):
                args += ["--device", str(cfg["device"])]
            for k, v in fusion.items():
                args += [f"--{k}", str(v)]
            runner = JobRunner(str(cfg.get("cmd_backend", "local")),
                               conf=cfg.get("cmd_conf"))
            # a TPU chip is process-exclusive (and this process may already
            # hold it), so non-CPU local runs execute jobs sequentially
            seq = (str(cfg.get("device")) != "cpu"
                   and runner.backend in ("local", "stdout"))
            rc = runner.run(
                args, str(dec_dir / "log" / "decode.JOB.log"), array=(1, nj),
                options=JobOptions(max_jobs_run=1 if seq else None),
            )
            if rc:
                raise RuntimeError(
                    f"decode jobs failed rc={rc} (logs: {dec_dir}/log)"
                )
            # merge job outputs (asr.sh concatenates the per-job scp files)
            merged = dec_dir / "1best_recog"
            merged.mkdir(parents=True, exist_ok=True)
            for name in ("text", "token", "score"):
                lines = []
                for j in range(1, nj + 1):
                    f = dec_dir / f"job{j}" / "1best_recog" / name
                    if f.exists():
                        lines += f.read_text().splitlines()
                (merged / name).write_text(
                    "\n".join(sorted(lines)) + ("\n" if lines else "")
                )
    if stage <= 13 <= stop:
        from llm_guided_asr_tpu.bin.score import score

        test_split = "test" if "test" in dirs else "valid"
        result = score(
            str(work / test_split / "text"),
            str(expdir / "decode" / test_split / "1best_recog" / "text"),
            str(expdir / "score" / test_split),
            token_type="char" if cfg["token_type"] == "char" else "word",
        )
        logger.info(f"stage13 [{test_split}]: {result['metric']}={result['err']:.2f}")
        print(json.dumps(result))

    if stage <= 14 <= stop:
        # stage 14: pack the trained model into a portable bundle
        # (asr.sh:1727 packing via espnet2/bin/pack.py)
        from llm_guided_asr_tpu.bin.pack import pack

        model_file = next(train_exp.glob("valid.*.ave_*best.msgpack"), None) or (
            train_exp / "latest.msgpack"
        )
        bundle = expdir / "pack" / "asr_model.zip"
        stats = stats_dir / "train" / "feats_stats.npz"
        pack(str(bundle), str(train_exp / "config.yaml"), str(model_file),
             stats_file=str(stats) if stats.exists() else None)
        logger.info(f"stage14: packed -> {bundle}")

    if stage <= 15 <= stop:
        # stage 15: model-zoo export (asr.sh:1760 upload_hf).  No network
        # egress in this environment, so the stage produces the exact upload
        # artifact (bundle + model card) for a later `huggingface-cli upload`.
        card = expdir / "pack" / "README.md"
        card.parent.mkdir(parents=True, exist_ok=True)
        result_file = expdir / "score" / ("test" if "test" in dirs else "valid")
        lines = ["---", "tags: [automatic-speech-recognition, llm-guided-asr-tpu]",
                 "---", "", f"# {expdir.name}", "",
                 "Trained with llm_guided_asr_tpu (asr_pipeline stages "
                 f"{stage}-{stop}).", ""]
        res = result_file / "result.txt"
        if res.exists():
            lines += ["## Results", "", "```",
                      res.read_text().strip()[:2000], "```"]
        card.write_text("\n".join(lines) + "\n")
        logger.info(f"stage15: export artifact ready under {expdir / 'pack'} "
                    "(upload requires network; run huggingface-cli there)")


if __name__ == "__main__":
    main()
