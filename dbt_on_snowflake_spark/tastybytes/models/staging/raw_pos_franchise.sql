-- Staging passthrough view over the franchise source
-- (reference dbt/models/staging/raw_pos_franchise.sql:1-2).
SELECT *
FROM {{ source('tb_101', 'franchise') }}
