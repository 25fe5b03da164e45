-- Staging passthrough view over the location source
-- (reference dbt/models/staging/raw_pos_location.sql:1-2).
SELECT *
FROM {{ source('tb_101', 'location') }}
