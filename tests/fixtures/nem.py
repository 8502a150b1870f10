"""Deterministic NEM-shaped fixtures (FIXTURES.md §B, seed=42).

Mirrors the data model of the reference (nested facility docs, fueltech
map, long facts, event stream with edge cases) without copying any of its
data. Everything is generated from a seeded RNG so goldens are stable.
"""

from __future__ import annotations

import json
import random

REGIONS = ["NSW1", "QLD1", "VIC1", "SA1", "TAS1"]
REGION_NAMES = {
    "NSW1": "New South Wales",
    "QLD1": "Queensland",
    "VIC1": "Victoria",
    "SA1": "South Australia",
    "TAS1": "Tasmania",
}
FUELTECHS = [
    ("coal_black", "Coal (Black)", False),
    ("coal_brown", "Coal (Brown)", False),
    ("gas_ccgt", "Gas (CCGT)", False),
    ("gas_ocgt", "Gas (OCGT)", False),
    ("hydro", "Hydro", True),
    ("wind", "Wind", True),
    ("solar_utility", "Solar (Utility)", True),
    ("battery_charging", "Battery (Charging)", True),
    ("battery_discharging", "Battery (Discharging)", True),
    ("distillate", "Distillate", False),
    ("bioenergy_biomass", "Bioenergy (Biomass)", True),
    ("aggregator_vpp", "-", True),
    ("imports", "-", False),
    ("exports", "-", False),
    ("interconnector", "-", False),
    ("nuclear", "-", False),
]
STATUSES = ["operating", "retired", "committed"]

# 25 five-minute timestamps over ~2h; mixed +10:00/+11:00 offsets (real NEM
# data carries both, FIXTURES.md B5).
BASE_TS = [(10, 5 * i) for i in range(25)]  # (hour-ish index unused; minutes)


def _ts(i: int, offset: str = "+10:00") -> str:
    h = 10 + (5 * i) // 60
    m = (5 * i) % 60
    return f"2025-10-15T{h:02d}:{m:02d}:00{offset}"


def facilities_raw(n: int = 40, seed: int = 42) -> list[dict]:
    """B1: nested facility docs. Includes a facility with no operating
    units, one with null location, one WEM facility, and units whose
    fueltech maps to '-'."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        code = f"FAC{i:03d}"
        region = "WEM" if i == 3 else REGIONS[i % len(REGIONS)]
        n_units = rng.randint(1, 4)
        units = []
        for u in range(n_units):
            if i == 7:
                status = "retired"  # facility with no operating units
            else:
                status = STATUSES[0] if rng.random() < 0.75 else rng.choice(STATUSES[1:])
            ft = FUELTECHS[rng.randrange(len(FUELTECHS))][0] if (i, u) != (5, 0) else "imports"
            units.append(
                {
                    "code": f"{code}U{u}",
                    "fueltech_id": ft,
                    "status_id": status,
                    "capacity_registered": round(rng.uniform(5, 500), 1),
                    "capacity_maximum": None if rng.random() < 0.2 else round(rng.uniform(5, 550), 1),
                    "capacity_storage": None,
                    "emissions_factor_co2": None if rng.random() < 0.3 else round(rng.uniform(0, 1.4), 4),
                    "dispatch_type": rng.choice(["GENERATOR", "LOAD", "BIDIRECTIONAL"]),
                    "data_first_seen": _ts(0),
                    "data_last_seen": _ts(24),
                    "created_at": "2020-01-01T00:00:00Z",
                    "updated_at": "2025-01-01T00:00:00Z",
                }
            )
        out.append(
            {
                "code": code,
                "name": f"Facility {i:03d}",
                "network_id": "NEM",
                "network_region": region,
                "description": f"<p>Synthetic facility {i}</p>",
                "location": None
                if i == 11
                else {"lat": round(-37.0 + rng.uniform(-6, 9), 4), "lng": round(145.0 + rng.uniform(-8, 8), 4)},
                "units": units,
            }
        )
    return out


def fueltech_map() -> list[dict]:
    """B2."""
    return [{"fueltech_id": f, "label": l, "renewable": r} for f, l, r in FUELTECHS]


def region_lookup() -> list[dict]:
    """B4."""
    return [{"region_id": r, "region_name": REGION_NAMES[r]} for r in REGIONS]


def facility_readings(facs: list[dict], seed: int = 43) -> list[dict]:
    """B5: per operating unit × 25 timestamps; negative power for
    battery_charging units; one orphan unit_code; mixed offsets."""
    rng = random.Random(seed)
    rows = []
    for f in facs:
        if f["network_region"] == "WEM":
            continue
        for u in f["units"]:
            if u["status_id"] != "operating":
                continue
            for i in range(25):
                off = "+11:00" if (i % 7 == 3) else "+10:00"
                base = rng.uniform(0, u["capacity_registered"] or 100)
                power = -abs(base) if u["fueltech_id"] == "battery_charging" else base
                rows.append(
                    {
                        "facility_code": f["code"],
                        "unit_code": u["code"],
                        "timestamp": _ts(i, off),
                        "power": round(power, 2),
                        "emission": round(abs(power) * (u["emissions_factor_co2"] or 0.0), 3),
                    }
                )
    # orphan unit (absent from unit_to_facility): must be semi-join-dropped
    for i in range(25):
        rows.append(
            {
                "facility_code": "GHOST",
                "unit_code": "GHOSTU0",
                "timestamp": _ts(i),
                "power": 9.9,
                "emission": 0.1,
            }
        )
    return rows


def market_readings(seed: int = 44) -> list[dict]:
    """B6: 5 regions × 25 timestamps, one negative price, one missing
    (region, ts) pair."""
    rng = random.Random(seed)
    rows = []
    for r in REGIONS:
        for i in range(25):
            if (r, i) == ("TAS1", 13):
                continue  # hole → left-join null
            price = -12.5 if (r, i) == ("SA1", 5) else round(rng.uniform(20, 300), 2)
            rows.append(
                {
                    "region_code": r,
                    "timestamp": _ts(i),
                    "price": price,
                    "demand": round(rng.uniform(500, 9000), 1),
                }
            )
    return rows


def event_stream(seed: int = 45) -> list[str]:
    """B8: JSONL event payloads in replay order with ~20 interleaved
    edge-case lines (sentinel, malformed, invalid, duplicate, late,
    unknown facility, unparseable ts, missing measures)."""
    rng = random.Random(seed)
    facs = facilities_raw()
    lines: list[str] = []
    # warm-start sentinel first (publisher.py:29-37)
    lines.append(json.dumps({"timestamp": "starting...", "price_dmwh": 0, "demand_mw": 0}))
    operating = [f for f in facs if f["network_region"] != "WEM" and any(u["status_id"] == "operating" for u in f["units"])]
    for i in range(25):
        for f in operating:
            ev = {
                "facility_id": f["code"],
                "timestamp": _ts(i, "+11:00" if i % 7 == 3 else "+10:00"),
                "power_mw": round(rng.uniform(-50, 400), 2),
                "co2_tonnes": round(rng.uniform(0, 350), 2),
            }
            lines.append(json.dumps(ev))
        for r in REGIONS:
            lines.append(
                json.dumps(
                    {
                        "region_id": r,
                        "timestamp": _ts(i),
                        "price_dmwh": round(rng.uniform(-15, 300), 2),
                        "demand_mw": round(rng.uniform(500, 9000), 1),
                    }
                )
            )
        # deterministic edge-case interleave
        if i == 2:
            lines.append("{not json at all")
        if i == 4:
            lines.append(json.dumps({"facility_id": "", "timestamp": _ts(i), "power_mw": 1.0, "co2_tonnes": 1.0}))
        if i == 5:
            lines.append(json.dumps({"facility_id": "FAC000", "timestamp": "short-ts", "power_mw": 1.0, "co2_tonnes": 1.0}))
        if i == 6:
            lines.append(json.dumps({"facility_id": "FAC001", "timestamp": _ts(i)}))  # missing measures → 0.0
        if i == 8:
            lines.append(json.dumps({"facility_id": "UNKNOWN9", "timestamp": _ts(i), "power_mw": 5.0, "co2_tonnes": 5.0}))
        if i == 9:  # duplicate of the first operating facility's event at ts 9
            ev = {
                "facility_id": operating[0]["code"],
                "timestamp": _ts(9, "+11:00" if 9 % 7 == 3 else "+10:00"),
                "power_mw": 123.45,
                "co2_tonnes": 67.89,
            }
            lines.append(json.dumps(ev))
            lines.append(json.dumps(ev))
        if i == 12:  # late/out-of-order: event for ts 3 arriving at replay pos 12
            lines.append(
                json.dumps(
                    {
                        "facility_id": operating[1]["code"],
                        "timestamp": _ts(3),
                        "power_mw": 77.7,
                        "co2_tonnes": 7.7,
                    }
                )
            )
        if i == 14:  # unparseable but length-≥20 timestamp: passes length gate, dies at parse
            lines.append(
                json.dumps(
                    {
                        "facility_id": "FAC002",
                        "timestamp": "9999-99-99T99:99:99+99:99",
                        "power_mw": 3.0,
                        "co2_tonnes": 3.0,
                    }
                )
            )
    return lines


def facility_api_responses(readings: list[dict], batch_size: int = 25) -> list[dict]:
    """B10: the OE facility endpoint's nested response shape (power +
    emissions metric blocks, per-unit series, [ts, value] pairs) built
    from the long fixture readings — one response doc per unit batch.
    Values are stringified: JSON numbers arrive as strings under the
    all-string pair schema (sources.extract.RESPONSE_SCHEMA)."""
    by_unit: dict[str, list[dict]] = {}
    for r in readings:
        by_unit.setdefault(r["unit_code"], []).append(r)
    units = sorted(by_unit)
    out = []
    for b in range(0, len(units), batch_size):
        batch = units[b : b + batch_size]
        power_results, emis_results = [], []
        for u in batch:
            rows = by_unit[u]
            power_results.append(
                {
                    "name": f"power_{u}",
                    "columns": {"unit_code": u},
                    "data": [[r["timestamp"], repr(r["power"])] for r in rows],
                }
            )
            emis_results.append(
                {
                    "name": f"emissions_{u}",
                    "columns": {"unit_code": u},
                    "data": [[r["timestamp"], repr(r["emission"])] for r in rows],
                }
            )
        out.append(
            {
                "data": [
                    {"metric": "power", "results": power_results},
                    {"metric": "emissions", "results": emis_results},
                ]
            }
        )
    return out


def market_api_response(market: list[dict]) -> dict:
    """B10: the OE market endpoint's shape — region codes only in the
    prefixed series names (price_NSW1), no columns struct."""
    by_region: dict[str, list[dict]] = {}
    for r in market:
        by_region.setdefault(r["region_code"], []).append(r)
    regions = sorted(by_region)
    return {
        "data": [
            {
                "metric": "price",
                "results": [
                    {
                        "name": f"price_{reg}",
                        "columns": None,
                        "data": [[r["timestamp"], repr(r["price"])] for r in by_region[reg]],
                    }
                    for reg in regions
                ],
            },
            {
                "metric": "demand",
                "results": [
                    {
                        "name": f"demand_{reg}",
                        "columns": None,
                        "data": [[r["timestamp"], repr(r["demand"])] for r in by_region[reg]],
                    }
                    for reg in regions
                ],
            },
        ]
    }
