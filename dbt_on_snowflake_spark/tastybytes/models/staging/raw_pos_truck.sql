-- Staging passthrough view over the truck source
-- (reference dbt/models/staging/raw_pos_truck.sql:1-2).
SELECT *
FROM {{ source('tb_101', 'truck') }}
