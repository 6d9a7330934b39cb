"""API-client tests with a mocked HTTP layer (zero-egress machine)."""
import datetime as dt
import gzip

import pandas as pd

from sustaingym_tpu.data import api_clients as ac


class FakeResponse:
    def __init__(self, payload):
        self._payload = payload

    def json(self):
        return self._payload


class FakeSGIP:
    """Minimal stand-in for `requests` serving SGIP-shaped payloads."""

    def get(self, url, params=None, headers=None, auth=None):
        if url == ac.SGIP_LOGIN_URL:
            assert auth is not None
            return FakeResponse({"token": "tok"})
        assert headers == {"Authorization": "Bearer tok"}
        start = pd.Timestamp(params["starttime"])
        end = pd.Timestamp(params["endtime"])
        times = pd.date_range(start, end, freq="5min")
        if url == ac.SGIP_DATA_URLS["historical"]:
            return FakeResponse([
                {"point_time": t.isoformat(), "moer": 0.4 + 0.01 * i,
                 "ba": params["ba"]}
                for i, t in enumerate(times)])
        return FakeResponse([
            {"generated_at": t.isoformat(),
             "forecast": [{"value": 0.5 + 0.001 * k} for k in range(36)]}
            for t in times])


def test_sgip_historical_and_forecast():
    df = ac.get_data_sgip("2021-02-01T00:00:00+0000",
                          "2021-02-01T01:00:00+0000",
                          "SGIP_CAISO_PGE", "historical", http=FakeSGIP())
    assert list(df.columns) == ["moer"] and len(df) == 13
    assert str(df.index.tz) == "UTC"

    df = ac.get_data_sgip("2021-02-01T00:00:00+0000",
                          "2021-02-01T01:00:00+0000",
                          "SGIP_CAISO_PGE", "forecasted", http=FakeSGIP())
    assert list(df.columns) == [f"f{i+1}" for i in range(36)]


def test_save_monthly_moer(tmp_path):
    path = ac.save_monthly_moer(2021, 2, "SGIP_CAISO_PGE", str(tmp_path),
                                fetch=lambda *a, **k: ac.get_data_sgip(
                                    *a, **k, http=FakeSGIP()))
    with gzip.open(path, "rt") as f:
        df = pd.read_csv(f, index_col="time")
    assert "moer" in df.columns and "f36" in df.columns
    assert path.endswith("SGIP_CAISO_PGE_2021-02.csv.gz")


class FakeACN:
    def get(self, url, params=None, auth=None):
        assert "caltech" in url
        page = params["page"]
        if page > 1:
            return FakeResponse({"_items": []})
        return FakeResponse({"_items": [
            {"connectionTime": "2021-06-01T08:00:00Z",
             "disconnectTime": "2021-06-01T16:00:00Z",
             "doneChargingTime": "2021-06-01T15:00:00Z",
             "kWhDelivered": 12.3,
             "spaceID": "CA-496", "sessionID": "s1",
             "userInputs": [{"kWhRequested": 20.0}]},
            {"connectionTime": "2021-06-01T09:00:00Z",
             "disconnectTime": "2021-06-01T11:00:00Z",
             "doneChargingTime": None,
             "kWhDelivered": 5.0,
             "spaceID": "CA-497", "sessionID": "s2",
             "userInputs": None},
        ]})


def test_fetch_acn_sessions():
    df = ac.fetch_acn_sessions(
        "caltech", dt.datetime(2021, 6, 1), dt.datetime(2021, 6, 2),
        http=FakeACN())
    assert len(df) == 2
    assert bool(df["claimed"][0]) and not bool(df["claimed"][1])
    assert df["requested_energy (kWh)"][0] == 20.0
    assert df["station_id"].tolist() == ["CA-496", "CA-497"]
