"""Warehouse StructTypes — the Spark mapping of init-db/init.sql (SURVEY.md
§1.2). The one place the reference is strict (declared DDL + required-
columns checks) stays strict here: fixed schemas, explicit casts.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# warehouse.clients (init-db/init.sql:21-32; input columns etl/app.py:150)
CLIENTS = StructType(
    [
        StructField("client_id", StringType(), False),
        StructField("nom", StringType(), False),
        StructField("prenom", StringType(), False),
        StructField("email", StringType(), True),
        StructField("telephone", StringType(), True),  # leading-zero hazard: never numeric
        StructField("adresse", StringType(), True),
    ]
)

# warehouse.produits (init-db/init.sql:35-45; input columns etl/app.py:179)
PRODUITS = StructType(
    [
        StructField("produit_id", StringType(), False),
        StructField("nom", StringType(), False),
        StructField("categorie", StringType(), True),
        StructField("prix_unitaire", DecimalType(10, 2), False),
        StructField("stock_disponible", IntegerType(), False),
        StructField("description", StringType(), True),
    ]
)

# warehouse.ventes (init-db/init.sql:48-60; input columns etl/app.py:208)
VENTES = StructType(
    [
        StructField("vente_id", StringType(), False),
        StructField("client_id", StringType(), False),
        StructField("produit_id", StringType(), False),
        StructField("quantite", IntegerType(), False),
        StructField("prix_total", DecimalType(10, 2), False),
        StructField("date_vente", TimestampType(), False),
    ]
)

# warehouse.file_metadata (init-db/init.sql:11-17)
FILE_METADATA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("filename", StringType(), False),
        StructField("last_modified", TimestampType(), True),
        StructField("last_processed", TimestampType(), True),
        StructField("status", StringType(), True),  # success | error
    ]
)

# business key + NOT NULL columns per table (constraint semantics -> the
# explicit validation ops in operators/warehouse.py)
BUSINESS_KEYS = {"clients": "client_id", "produits": "produit_id", "ventes": "vente_id"}
NOT_NULL = {
    "clients": ["client_id", "nom", "prenom"],
    "produits": ["produit_id", "nom", "prix_unitaire", "stock_disponible"],
    "ventes": ["vente_id", "client_id", "produit_id", "quantite", "prix_total", "date_vente"],
}
FOREIGN_KEYS = {  # fact column -> (dim table, dim column); init-db/init.sql:58-59
    "ventes": {"client_id": ("clients", "client_id"), "produit_id": ("produits", "produit_id")},
}
TABLE_SCHEMAS = {"clients": CLIENTS, "produits": PRODUITS, "ventes": VENTES}
