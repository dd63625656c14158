#!/usr/bin/env python3
"""Multi-task training CLI: --task {asr,lm,st,enh,spk,tts,hubert,s2t}."""


def main(cmd=None):
    import sys

    args = list(cmd if cmd is not None else sys.argv[1:])
    task = None
    for i, a in enumerate(args):
        if a == "--task" and i + 1 < len(args):
            task = args[i + 1]
        elif a.startswith("--task="):
            task = a.split("=", 1)[1]
    if task == "asr":
        from llm_guided_asr_tpu.tasks.asr import ASRTask

        ASRTask.main(_strip_task(args))
    elif task == "lm":
        from llm_guided_asr_tpu.tasks.lm import LMTask

        LMTask.main(_strip_task(args))
    elif task == "st":
        from llm_guided_asr_tpu.tasks.st import STTask

        STTask.main(_strip_task(args))
    else:
        from llm_guided_asr_tpu.tasks.generic import GenericTask

        GenericTask.main(args)


def _strip_task(args):
    out = []
    i = 0
    while i < len(args):
        if args[i] == "--task":
            i += 2
        elif args[i].startswith("--task="):
            i += 1
        else:
            out.append(args[i])
            i += 1
    return out


if __name__ == "__main__":
    main()
