"""Deterministic Tasty Bytes fixture generator (FIXTURES.md §A).

Generates the reference's 8 raw tables (DDL: setup/setup_data.sql:6-137)
as parquet, seed-fixed, satisfying every declared test constraint and the
cross-table requirements that exercise each operator:

- FK closure for all inner joins in the `orders` mart
- NULL + unmatched customer_ids (left-join null-extension path)
- customers with orders at >=2 locations (ARRAY_AGG DISTINCT non-trivial)
- truck.primary_city <-> location.city many-to-many overlap
- locations with trucks but no orders (coalesce(...,0) path)
- order_header.location_id is FLOAT (cross-type join, setup_data.sql:86)
- stringly-typed numerics (city_population, order_tax_amount, ...)
- the engine-added order_failed boolean (SURVEY §1.4 ghost column)
- menu_item_health_metrics_obj as a JSON string (VARIANT stand-in)
- TIME(9) shift columns as "HH:mm:ss" strings (Spark has no TIME type)
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

SEED = 42

CITIES = [
    "San Mateo", "Seattle", "Denver", "Boston", "Oslo", "Stockholm",
    "Warsaw", "Krakow", "London", "Manchester", "Tokyo", "Osaka",
]
COUNTRIES = [
    ("United States", "USD", "US"), ("Norway", "NOK", "NO"),
    ("Sweden", "SEK", "SE"), ("Poland", "PLN", "PL"),
    ("United Kingdom", "GBP", "GB"), ("Japan", "JPY", "JP"),
]
BRANDS = [
    ("Guac n' Roll", "Tacos"), ("Smoky BBQ", "BBQ"),
    ("Le Coin des Crepes", "Crepes"), ("Freezing Point", "Ice Cream"),
    ("Better Off Bread", "Sandwiches"), ("Kitakata Ramen Bar", "Ramen"),
]


def _money(rng: np.random.Generator, lo: float, hi: float, n: int) -> np.ndarray:
    return np.round(rng.uniform(lo, hi, n), 2)


def generate(out_dir: str) -> dict[str, pd.DataFrame]:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    # country (setup_data.sql:6-15)
    n_city = len(CITIES)
    country = pd.DataFrame(
        {
            "country_id": np.arange(1, n_city + 1),
            "country": [COUNTRIES[i % 6][0] for i in range(n_city)],
            "iso_currency": [COUNTRIES[i % 6][1] for i in range(n_city)],
            "iso_country": [COUNTRIES[i % 6][2] for i in range(n_city)],
            "city_id": np.arange(101, 101 + n_city),
            "city": CITIES,
            # VARCHAR holding positive integers (setup_data.sql:14)
            "city_population": [
                str(int(p)) for p in rng.integers(50_000, 5_000_000, n_city)
            ],
        }
    )

    # franchise (setup_data.sql:18-29)
    n_fr = 50
    franchise = pd.DataFrame(
        {
            "franchise_id": np.arange(1, n_fr + 1),
            "first_name": [f"First{i}" for i in range(n_fr)],
            "last_name": [f"Last{i}" for i in range(n_fr)],
            "city": rng.choice(CITIES, n_fr),
            "country": rng.choice([c[0] for c in COUNTRIES], n_fr),
            "e_mail": [f"owner{i}@example.com" for i in range(n_fr)],
            "phone_number": [f"+1-555-{1000 + i}" for i in range(n_fr)],
        }
    )

    # location (setup_data.sql:31-42) — cities overlap truck.primary_city
    n_loc = 80
    loc_city = rng.choice(CITIES, n_loc)
    location = pd.DataFrame(
        {
            "location_id": np.arange(1, n_loc + 1),
            "placekey": [f"pk-{i:05d}" for i in range(n_loc)],
            "location": [f"Venue {i}" for i in range(n_loc)],
            "city": loc_city,
            "region": rng.choice(["West", "East", "North", "South"], n_loc),
            "iso_country_code": rng.choice([c[2] for c in COUNTRIES], n_loc),
            "country": rng.choice([c[0] for c in COUNTRIES], n_loc),
        }
    )

    # menu (setup_data.sql:44-59) — VARIANT column as JSON string
    n_menu = 60
    menu = pd.DataFrame(
        {
            "menu_id": np.arange(1, n_menu + 1),
            "menu_type_id": (np.arange(n_menu) % 6) + 1,
            "menu_type": [BRANDS[i % 6][1] for i in range(n_menu)],
            "truck_brand_name": [BRANDS[i % 6][0] for i in range(n_menu)],
            "menu_item_id": np.arange(1001, 1001 + n_menu),
            "menu_item_name": [f"Item {i}" for i in range(n_menu)],
            "item_category": rng.choice(["Main", "Side", "Dessert", "Drink"], n_menu),
            "item_subcategory": rng.choice(["Hot", "Cold"], n_menu),
            "cost_of_goods_usd": _money(rng, 0.5, 8.0, n_menu),
            "sale_price_usd": _money(rng, 2.0, 20.0, n_menu),
            "menu_item_health_metrics_obj": [
                json.dumps(
                    {
                        "menu_item_health_metrics": [
                            {
                                "ingredients": [f"ing{j}" for j in range(3)],
                                "is_gluten_free_flag": "Y" if i % 3 == 0 else "N",
                            }
                        ]
                    }
                )
                for i in range(n_menu)
            ],
        }
    )

    # truck (setup_data.sql:61-79)
    n_truck = 40
    truck = pd.DataFrame(
        {
            "truck_id": np.arange(1, n_truck + 1),
            "menu_type_id": (np.arange(n_truck) % 6) + 1,
            "primary_city": rng.choice(CITIES[:8], n_truck),  # m2m overlap
            "region": rng.choice(["West", "East", "North", "South"], n_truck),
            "iso_region": rng.choice(["W", "E", "N", "S"], n_truck),
            "country": rng.choice([c[0] for c in COUNTRIES], n_truck),
            "iso_country_code": rng.choice([c[2] for c in COUNTRIES], n_truck),
            "franchise_flag": rng.integers(0, 2, n_truck),
            "year": rng.integers(2001, 2024, n_truck),
            "make": rng.choice(["Ford", "Chevy", "Iveco", "MAN"], n_truck),
            "model": rng.choice(["A", "B", "C"], n_truck),
            "ev_flag": rng.integers(0, 2, n_truck),
            "franchise_id": rng.integers(1, n_fr + 1, n_truck),  # FK closure
            "truck_opening_date": pd.to_datetime("2015-01-01")
            + pd.to_timedelta(rng.integers(0, 3000, n_truck), unit="D"),
        }
    )

    # customer_loyalty (setup_data.sql:118-137)
    n_cust = 500
    customer_loyalty = pd.DataFrame(
        {
            "customer_id": np.arange(1, n_cust + 1),
            "first_name": [f"CFirst{i}" for i in range(n_cust)],
            "last_name": [f"CLast{i}" for i in range(n_cust)],
            "city": rng.choice(CITIES, n_cust),
            "country": rng.choice([c[0] for c in COUNTRIES], n_cust),
            "postal_code": [f"{10000 + i}" for i in range(n_cust)],
            "preferred_language": rng.choice(["en", "de", "fr", "es"], n_cust),
            "gender": rng.choice(["F", "M", "X"], n_cust),
            "favourite_brand": rng.choice([b[0] for b in BRANDS], n_cust),
            "marital_status": rng.choice(["single", "married"], n_cust),
            "children_count": [str(int(c)) for c in rng.integers(0, 5, n_cust)],
            "sign_up_date": pd.to_datetime("2020-01-01")
            + pd.to_timedelta(rng.integers(0, 1500, n_cust), unit="D"),
            "birthday_date": pd.to_datetime("1970-01-01")
            + pd.to_timedelta(rng.integers(0, 12000, n_cust), unit="D"),
            "e_mail": [f"c{i}@example.com" for i in range(n_cust)],
            "phone_number": [f"+1-777-{2000 + i}" for i in range(n_cust)],
        }
    )

    # order_header (setup_data.sql:81-101) + engine-added order_failed
    n_oh = 5000
    # ~20% anonymous; some non-null ids unmatched (> n_cust)
    cust_ids = rng.integers(1, n_cust + 51, n_oh).astype("float64")
    cust_ids[rng.random(n_oh) < 0.2] = np.nan
    amounts = _money(rng, 0.01, 10.0, n_oh)  # accepted_range (0,10]
    tax = np.round(amounts * 0.08, 2)
    disc = np.round(amounts * rng.choice([0.0, 0.05, 0.1], n_oh), 2)
    order_ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 180 * 24 * 3600, n_oh), unit="s"
    )
    shift_start = rng.integers(6, 14, n_oh)
    order_header = pd.DataFrame(
        {
            "order_id": np.arange(1, n_oh + 1),
            "truck_id": rng.integers(1, n_truck + 1, n_oh),
            # FLOAT in the reference DDL: cross-type FK to location_id.
            # Orders only visit locations 1..60: 61..80 exercise the
            # trucks-but-no-orders coalesce path.
            "location_id": rng.integers(1, 61, n_oh).astype("float64"),
            "customer_id": pd.array(
                [None if np.isnan(c) else int(c) for c in cust_ids],
                dtype="Int64",
            ),
            "discount_id": [
                None if d == 0 else f"D{int(d * 100)}" for d in disc
            ],
            "shift_id": rng.integers(1, 100, n_oh),
            "shift_start_time": [f"{h:02d}:00:00" for h in shift_start],
            "shift_end_time": [f"{h + 8:02d}:00:00" for h in shift_start],
            "order_channel": rng.choice(["POS", "APP", "WEB"], n_oh),
            "order_ts": order_ts,
            "served_ts": [
                (t + pd.Timedelta(minutes=7)).strftime("%Y-%m-%d %H:%M:%S")
                for t in order_ts
            ],
            "order_currency": rng.choice(["USD", "EUR", "GBP"], n_oh),
            "order_amount": amounts,
            "order_tax_amount": [f"{t:.2f}" for t in tax],
            "order_discount_amount": [f"{d:.2f}" for d in disc],
            "order_total": np.round(amounts + tax - disc, 2),
            "order_failed": rng.random(n_oh) < 0.02,
        }
    )

    # order_detail (setup_data.sql:103-116)
    n_od = 15000
    od_order = rng.integers(1, n_oh + 1, n_od)
    qty = rng.integers(1, 6, n_od)
    unit_price = _money(rng, 2.0, 20.0, n_od)
    order_detail = pd.DataFrame(
        {
            "order_detail_id": np.arange(1, n_od + 1),
            "order_id": od_order,
            "menu_item_id": rng.integers(1001, 1001 + n_menu, n_od),
            "discount_id": [None] * n_od,
            "line_number": rng.integers(1, 10, n_od),
            "quantity": qty,
            "unit_price": unit_price,
            "price": np.round(qty * unit_price, 2),
            "order_item_discount_amount": [
                f"{d:.2f}" for d in _money(rng, 0.0, 1.0, n_od)
            ],
        }
    )

    tables = {
        "country": country,
        "franchise": franchise,
        "location": location,
        "menu": menu,
        "truck": truck,
        "customer_loyalty": customer_loyalty,
        "order_header": order_header,
        "order_detail": order_detail,
    }
    # DATE-typed columns in the reference DDL (setup_data.sql:77,132-133)
    truck["truck_opening_date"] = truck["truck_opening_date"].dt.date
    customer_loyalty["sign_up_date"] = customer_loyalty["sign_up_date"].dt.date
    customer_loyalty["birthday_date"] = customer_loyalty["birthday_date"].dt.date
    for name, df in tables.items():
        # microsecond timestamps: the engine session reads TIMESTAMP(NANOS)
        # as long (nanosAsLong, for the driver testdata) — don't trip that
        df.to_parquet(
            os.path.join(out_dir, f"{name}.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    return tables
