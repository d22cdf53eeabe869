"""MetricLogger alerting (the offline wandb.alert equivalent)."""

import json

from fusiondepth_tpu.utils.logging import MetricLogger


def test_alert_written_and_watch_fires(tmp_path):
    lg = MetricLogger(str(tmp_path), "train", use_tb=False)
    lg.add_watch("loss", "nan", title="non-finite loss")
    lg.add_watch("abs_rel", ">", 0.5, title="abs_rel regressed")

    lg.log_scalars(1, {"loss": 0.4, "abs_rel": 0.1})   # no alerts
    lg.log_scalars(2, {"loss": float("nan")})          # nan watch
    lg.log_scalars(3, {"abs_rel": 0.9})                # threshold watch
    lg.alert("manual", "something happened", level="ERROR")
    lg.close()

    recs = [json.loads(l) for l in open(lg.alert_path)]
    titles = [r["title"] for r in recs]
    assert titles == ["non-finite loss", "abs_rel regressed", "manual"]
    assert recs[0]["text"].startswith("step 2")
    assert recs[2]["level"] == "ERROR"
