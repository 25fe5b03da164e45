-- Staging passthrough view over the order_header source
-- (reference dbt/models/staging/raw_pos_order_header.sql:1-2).
SELECT *
FROM {{ source('tb_101', 'order_header') }}
