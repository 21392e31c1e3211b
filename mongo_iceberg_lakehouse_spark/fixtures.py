"""Re-creation of the reference's 6-document seed dataset.

Semantics from FIXTURES.md §1 / the reference's airflow/data/BRONZE/
orders.json: 6 order documents across 3 cities, documents 6 carrying
deliberate schema drift (``shipping_address.landmark`` + top-level
``discount``). Golden outputs derived from the reference's executed
notebooks (BASELINE.md): bronze count 6; silver struct
{city,state,zip,country='INDIA'} with landmark dropped; gold report
(Hyderabad, INDIA, 1525.5, 2), (Bangalore, INDIA, 440.0, 3),
(Mumbai, INDIA, 15.99, 1) descending by revenue.
"""

from __future__ import annotations

import json
import tempfile


def _order(order_id, customer_id, date, status, items, total, city, state,
           zipc, landmark=None, discount=None):
    doc = {
        "order_id": order_id,
        "customer_id": customer_id,
        "order_date": date,
        "status": status,
        "items": [
            {"product_id": p, "product_name": n, "quantity": q, "unit_price": u}
            for p, n, q, u in items
        ],
        "total_amount": total,
        "shipping_address": {"city": city, "state": state, "zip": zipc},
    }
    if landmark is not None:
        doc["shipping_address"]["landmark"] = landmark
    if discount is not None:
        doc["discount"] = discount
    return doc


SEED_ORDERS = [
    _order("ORD-2024-001", "CUST-101", "2024-02-01T08:30:00", "DELIVERED",
           [("P001", "Gaming Laptop", 1, 1200.50), ("P005", "Wireless Mouse", 1, 25.00)],
           1225.50, "Hyderabad", "Telangana", "500081"),
    _order("ORD-2024-002", "CUST-102", "2024-02-02T14:15:00", "PROCESSING",
           [("P003", "Mechanical Keyboard", 2, 45.00)],
           90.00, "Bangalore", "Karnataka", "560001"),
    _order("ORD-2024-003", "CUST-101", "2024-02-03T09:00:00", "SHIPPED",
           [("P002", "Monitor 27-inch", 1, 300.00)],
           300.00, "Hyderabad", "Telangana", "500081"),
    _order("ORD-2024-004", "CUST-103", "2024-02-04T11:45:00", "CANCELLED",
           [("P010", "USB-C Hub", 1, 15.99)],
           15.99, "Mumbai", "Maharashtra", "400001"),
    _order("ORD-2024-005", "CUST-102", "2024-02-05T16:20:00", "DELIVERED",
           [("P005", "Wireless Mouse", 5, 25.00), ("P009", "Mouse Pad", 5, 10.00)],
           175.00, "Bangalore", "Karnataka", "560001"),
    _order("ORD-2024-00600", "CUST-1088", "2024-02-05T16:20:00", "DELIVERED",
           [("P005555", "Wireless Mouse", 5, 25.00), ("P009", "Mouse Pad", 5, 10.00)],
           175.00, "Bangalore", "Karnataka", "560001",
           landmark="more_market", discount=500),
]


def write_seed_json(path: str | None = None) -> str:
    """Write the seed documents as a JSON array file; returns the path."""
    if path is None:
        fh = tempfile.NamedTemporaryFile(
            "w", suffix="_orders.json", delete=False
        )
        with fh:
            json.dump(SEED_ORDERS, fh, indent=2)
        return fh.name
    with open(path, "w") as out:
        json.dump(SEED_ORDERS, out, indent=2)
    return path
