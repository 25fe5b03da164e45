-- Staging passthrough view over the order_detail source
-- (reference dbt/models/staging/raw_pos_order_detail.sql:1-2).
SELECT *
FROM {{ source('tb_101', 'order_detail') }}
