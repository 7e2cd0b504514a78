"""Summarize MT training runs (runs/*/metrics.jsonl) into the loss/BLEU
comparison table RESULTS.md records (bf16 vs int8-KV vs fp8-KV —
BASELINE measured config (4)).

Usage:  python tools/mt_run_table.py runs/mt_deen runs/mt_deen_int8kv ...
"""
import json
import os
import sys


def summarize(workdir):
    path = os.path.join(workdir, "metrics.jsonl")
    run = {"workdir": workdir}
    epochs = []
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("event") == "run_start":
                args = rec["event_args"]
                run["kv"] = args.get("kv_quant_train", "none")
                run["attention"] = args.get("attention_kind")
                run["dtype"] = args.get("dtype")
                run["epochs_planned"] = args.get("n_epochs")
                epochs = []          # latest attempt wins
            elif rec.get("event") == "epoch":
                epochs.append(rec)
            elif "bleu" in rec:
                run["bleu"] = rec["bleu"]
    if epochs:
        run["epochs_done"] = len(epochs)
        run["first_train_loss"] = round(epochs[0]["train_loss"], 4)
        run["final_train_loss"] = round(epochs[-1]["train_loss"], 4)
        run["final_val_loss"] = round(epochs[-1]["validation_loss"], 4)
        run["tokens_per_sec"] = epochs[-1].get("tokens_per_sec")
        run["mean_step_ms"] = epochs[-1].get("mean_step_ms")
    return run


def main():
    dirs = sys.argv[1:] or ["runs/mt_deen", "runs/mt_deen_int8kv",
                            "runs/mt_deen_fp8kv"]
    rows = []
    for d in dirs:
        try:
            rows.append(summarize(d))
        except FileNotFoundError:
            rows.append({"workdir": d, "missing": True})
    for r in rows:
        print(json.dumps(r))
    done = [r for r in rows if "final_val_loss" in r]
    if done:
        print("\n| run | kv-quant | epochs | train loss | val loss | BLEU |")
        print("|---|---|---|---|---|---|")
        for r in done:
            print(f"| {os.path.basename(r['workdir'])} | {r.get('kv')} | "
                  f"{r.get('epochs_done')} | {r.get('final_train_loss')} | "
                  f"{r.get('final_val_loss')} | {r.get('bleu', '—')} |")


if __name__ == "__main__":
    main()
